#!/bin/bash
# Round-3 on-chip A/B matrix, ordered by information value (highest first so
# a short tunnel window still captures the headline results).  Each step logs
# to /tmp/bm_<name>.log and never blocks the next.  Run AFTER tunnel is up.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 2700 "$@" >/tmp/bm_$name.json 2>/tmp/bm_$name.log
  echo "--- $name exit=$? tail:"; tail -3 /tmp/bm_$name.log; cat /tmp/bm_$name.json
}

# 0. Mosaic lowering smoke for ALL new kernels on the real chip (tiny, fast):
#    int4_matmul, int4_ffn, w4a8, decode_attention, ring-batcher knobs
run kernels python tools/drive_new_kernels.py

# 0b. serialized-executable cache over the relay (run twice: compile, load)
run aot_probe1 python tools/probe_aot_cache.py
run aot_probe2 python tools/probe_aot_cache.py

# 1. row-write restructure verify (same config as the 1186 tok/s run)
run b32_base python bench_decode.py --size 7b --quant int8 --ffn-kernel --batch 32 --act-quant

# 2. full new serving stack: + int8 KV cache + fused decode attention
run b32_kv8_fd python bench_decode.py --size 7b --quant int8 --ffn-kernel --batch 32 --act-quant --kv-quant int8 --flash-decode

# 3. serving best config end-to-end (ring batcher is always on now)
run stream_best python bench_stream.py --size 7b --volumes 16 --lanes 32 \
  --steps-per-sync 32 --quant int8 --ffn-kernel --act-quant \
  --kv-quant int8 --flash-decode

# 4. CLIP contrastive fine-tune step on chip (VERDICT #10a — wedged at 17:07)
run clip_train python bench_clip_train.py --size full --batch 2 --steps 4

# 5. ablations: int8 KV alone, flash-decode alone (isolate each knob)
run b32_kv8 python bench_decode.py --size 7b --quant int8 --ffn-kernel --batch 32 --act-quant --kv-quant int8
run b32_fd python bench_decode.py --size 7b --quant int8 --ffn-kernel --batch 32 --act-quant --flash-decode

# 6. int4 latency tier at batch 4 + fused int4 FFN kernel A/Bs
run b4_int4 python bench_decode.py --size 7b --quant int4 --batch 4
run b4_int4_ffn python bench_decode.py --size 7b --quant int4 --batch 4 --ffn-kernel
run b1_int4_ffn python bench_decode.py --size 7b --quant int4 --batch 1 --ffn-kernel

# 7. w4a8 at throughput batch: half w8a8's weight HBM on the int8 MXU path
run b32_w4a8 python bench_decode.py --size 7b --quant int4 --batch 32 --act-quant --kv-quant int8
run b32_w4a8_ffn python bench_decode.py --size 7b --quant int4 --batch 32 --act-quant --kv-quant int8 --ffn-kernel

# 8. speculative decoding latency tier: overhead floor (random weights) and
#    full-acceptance ceiling at batch 1, int4 weights
run b1_int4_spec python bench_decode.py --size 7b --quant int4 --batch 1 --spec-lookup 8
run b1_int4_spec_ceiling python bench_decode.py --size 7b --quant int4 --batch 1 --spec-lookup 8 --spec-repetitive
run b1_int4_plain python bench_decode.py --size 7b --quant int4 --batch 1

echo "MATRIX DONE $(date +%H:%M:%S)"
