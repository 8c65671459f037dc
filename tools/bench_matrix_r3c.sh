#!/bin/bash
# Round-3 session-3 matrix: speculative serving A/Bs.
# Rationale: decode attention at M=1 is MXU fill-latency bound
# (ops/pallas/decode_attention.py) — only M=K+1 verify forwards move the
# serving-context step, so speculation is the remaining throughput lever.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 2700 "$@" >/tmp/bm_$name.json 2>/tmp/bm_$name.log
  echo "--- $name exit=$? tail:"; tail -4 /tmp/bm_$name.log; cat /tmp/bm_$name.json
}

# 1+2: serving A/B at the best decode config (int4 w4a8 + fused FFN + kv8),
#      32 lanes — spec verify chunks vs plain ring decode
run stream_spec python bench_stream.py --size 7b --volumes 16 --lanes 32 \
  --steps-per-sync 8 --quant int4 --act-quant --ffn-kernel --kv-quant int8 \
  --spec-lookup 4
run stream_plain python bench_stream.py --size 7b --volumes 16 --lanes 32 \
  --steps-per-sync 32 --quant int4 --act-quant --ffn-kernel --kv-quant int8

# 3+4: LONG-CONTEXT decode (the M=1-floor-bound regime: b16, 608-slot cache)
#      with and without speculation, generate_speculative path
run b16_m608_spec python bench_decode.py --size 7b --quant int8 --ffn-kernel \
  --act-quant --kv-quant int8 --batch 16 --prompt-len 512 --spec-lookup 4
run b16_m608_plain python bench_decode.py --size 7b --quant int8 --ffn-kernel \
  --act-quant --kv-quant int8 --batch 16 --prompt-len 512

# 5: short-context b32 speculative generate (vs 3325 tok/s plain, matrix r3b)
run b32_spec python bench_decode.py --size 7b --quant int4 --act-quant \
  --kv-quant int8 --ffn-kernel --batch 32 --spec-lookup 4

echo "MATRIX-C DONE $(date +%H:%M:%S)"
