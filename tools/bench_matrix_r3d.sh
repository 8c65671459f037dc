#!/bin/bash
# Round-3 session-4 matrix: grouped-query attention (GQA einsum, no
# jnp.repeat of cached K/V) A/B re-baselines.  Historical pre-change rows:
#   b32 int4 w4a8 + int4-FFN + kv8 : 3325 tok/s (matrix r3b)
#   b16 prompt-512 int8+ffn+w8a8+kv8 : 769 (token-major) / 747 (head-major)
# NOTE (round-4 correction): --size 7b is Meditron/llama-2 geometry with
# num_kv_heads == num_heads (rep=1), and the pre-change code already skipped
# jnp.repeat at rep==1 — so these rows A/B a functional no-op at 7B.  The
# grouped einsum only removes materialized K/V copies for GQA geometries
# (rep>1, e.g. llama-3-style kv_heads=8); bench those to see the win.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 2700 "$@" >/tmp/bm_$name.json 2>/tmp/bm_$name.log
  echo "--- $name exit=$? tail:"; tail -4 /tmp/bm_$name.log; cat /tmp/bm_$name.json
}

# 1: long-context plain decode — the regime the repeat dominated
run gqa_b16_m608 python bench_decode.py --size 7b --quant int8 --ffn-kernel \
  --act-quant --kv-quant int8 --batch 16 --prompt-len 512

# 2: best-config short-context re-baseline
run gqa_b32_best python bench_decode.py --size 7b --quant int4 --act-quant \
  --kv-quant int8 --ffn-kernel --batch 32

echo "MATRIX-D DONE $(date +%H:%M:%S)"
