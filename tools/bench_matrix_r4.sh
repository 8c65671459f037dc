#!/bin/bash
# Round-4 decode matrix: the two new KV-cache levers vs the round-3 bests.
#   new lever A: --kv-quant int4  (nibble-packed rows + group-32 scales,
#                1.65x fewer cache bytes than int8; scales folded into the
#                grouped attention einsums exactly)
#   new lever B: --kv-dots        (kv_int8_dots: native int8x int8->int32 MXU
#                attention contractions reading the int8 cache directly — no
#                bf16 dequantized K/V copy materializes)
# Historical round-3 rows to beat:
#   b32 cache-128 int4 w4a8 + int4-FFN + kv8 : 3325 tok/s (9.6 ms/step)
#   b16 prompt-512 int8+ffn+w8a8+kv8        : 769 tok/s (20.8 ms/step)
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 2700 "$@" >/tmp/bm_$name.json 2>/tmp/bm_$name.log
  echo "--- $name exit=$? tail:"; tail -4 /tmp/bm_$name.log; cat /tmp/bm_$name.json
}

# --- short-context max-throughput tier (b32, cache 128) ---
# 1: re-baseline the r3 best in this session (tunnel conditions differ run to run)
run r4_b32_base python bench_decode.py --size 7b --quant int4 --act-quant \
  --ffn-kernel --kv-quant int8 --batch 32

# 2: int4 KV (lever A)
run r4_b32_kv4 python bench_decode.py --size 7b --quant int4 --act-quant \
  --ffn-kernel --kv-quant int4 --batch 32

# 3: int8 KV fed natively to the MXU dots (lever B)
run r4_b32_kv8dots python bench_decode.py --size 7b --quant int4 --act-quant \
  --ffn-kernel --kv-quant int8 --kv-dots --batch 32

# --- serving-length tier (b16, 512-token prompt -> 608-slot cache) ---
# KV reads rival weight reads here; the cache levers matter most.
# 4: r3 re-baseline
run r4_m608_base python bench_decode.py --size 7b --quant int8 --act-quant \
  --ffn-kernel --kv-quant int8 --batch 16 --prompt-len 512

# 5: + int8 dots
run r4_m608_kv8dots python bench_decode.py --size 7b --quant int8 --act-quant \
  --ffn-kernel --kv-quant int8 --kv-dots --batch 16 --prompt-len 512

# 6: int4 KV at serving length
run r4_m608_kv4 python bench_decode.py --size 7b --quant int8 --act-quant \
  --ffn-kernel --kv-quant int4 --batch 16 --prompt-len 512

echo "MATRIX-E DONE $(date +%H:%M:%S)"
