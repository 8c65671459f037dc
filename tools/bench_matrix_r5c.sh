#!/bin/bash
# Round-5 final measurement matrix (fresh session — /tmp from the first r5
# run was lost with the box).  All round-5 fixes are in:
#   * host constants in jitted closures + session-warmup thread (bench.py)
#   * persistent XLA cache off on the relay
#   * deferred batched admission (one program per burst) + 10 ms admission
#     window in the bench loop
#   * shape-static batched-admission keys
#   * spec tier per-chunk token budget + both-tier/both-provenance warmup
#   * bench_zeroshot host-side eps + forced-fetch calibration
# Legs:
#   1-2. bench.py twice — driver cold-start metric (two runs bound the
#        session-cost variance) + headline vol/s
#   3.   serving ceiling, plain tier (r4c: 11.12 vol/s, 0.7 s submits)
#   4.   same burst, spec_policy=auto (expect ~plain throughput)
#   5.   2-volume trickle, spec_policy=auto (expect spec-tier latency)
#   6.   bench_zeroshot --batch 4 (VERDICT #7: >=20 vol/s or roofline)
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 2700 "$@" >/tmp/bm_$name.json 2>/tmp/bm_$name.log
  echo "--- $name exit=$? tail:"; tail -6 /tmp/bm_$name.log; cat /tmp/bm_$name.json
}

run r5c_bench_1 python bench.py
run r5c_bench_2 python bench.py

SCFG="--size 7b --quant int4 --act-quant --ffn-kernel --kv-quant int8 \
      --lanes 32 --steps-per-sync 32 --volumes 16 --new-tokens 64"
run r5c_stream_devres python bench_stream.py $SCFG --device-resident

run r5c_stream_auto_burst python bench_stream.py $SCFG --device-resident \
  --spec-lookup 8 --spec-sample --spec-policy auto

run r5c_stream_auto_trickle python bench_stream.py --size 7b --quant int4 \
  --act-quant --ffn-kernel --kv-quant int8 --lanes 32 --steps-per-sync 32 \
  --volumes 2 --new-tokens 64 --device-resident \
  --spec-lookup 8 --spec-sample --spec-policy auto

run r5c_zeroshot_b4 python bench_zeroshot.py --size full --batch 4

echo "MATRIX-R5C DONE $(date +%H:%M:%S)"
