#!/bin/bash
# Re-run of the round-3 matrix entries that failed before the Mosaic
# lowering fixes (int4/w4a8/decode-attention kernels) and the
# device_params negotiated-layout fix landed.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 2700 "$@" >/tmp/bm_$name.json 2>/tmp/bm_$name.log
  echo "--- $name exit=$? tail:"; tail -3 /tmp/bm_$name.log; cat /tmp/bm_$name.json
}

# highest information first
run b32_kv8_fd python bench_decode.py --size 7b --quant int8 --ffn-kernel --batch 32 --act-quant --kv-quant int8 --flash-decode
run stream_best python bench_stream.py --size 7b --volumes 16 --lanes 32 \
  --steps-per-sync 32 --quant int8 --ffn-kernel --act-quant \
  --kv-quant int8 --flash-decode
run b32_kv8 python bench_decode.py --size 7b --quant int8 --ffn-kernel --batch 32 --act-quant --kv-quant int8
run b32_fd python bench_decode.py --size 7b --quant int8 --ffn-kernel --batch 32 --act-quant --flash-decode
run b32_w4a8 python bench_decode.py --size 7b --quant int4 --batch 32 --act-quant --kv-quant int8
run b32_w4a8_ffn python bench_decode.py --size 7b --quant int4 --batch 32 --act-quant --kv-quant int8 --ffn-kernel

echo "MATRIX-B DONE $(date +%H:%M:%S)"
