#!/bin/bash
# Round-5 on-chip legs (VERDICT r4 items 1, 2, 5, 7):
#   * bench.py TWICE consecutively — the driver cold-start metric with the
#     corrected anatomy (host constants, session-warmup thread, persistent
#     cache off on the relay); the two runs bound the session-cost variance
#   * serving ceiling re-measure after deferred batched admission
#     (r4c: 11.12 vol/s with 0.7 s of per-submit dispatches; the burst now
#     admits through ONE program)
#   * auto spec-policy legs: the same saturated burst (expect ~plain
#     throughput) and a 2-volume trickle (expect spec-tier latency)
#   * bench_zeroshot --batch 4 with host-side eps + per-chunk end fetches
#     (two eager device ops per dispatch removed)
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 2700 "$@" >/tmp/bm_$name.json 2>/tmp/bm_$name.log
  echo "--- $name exit=$? tail:"; tail -6 /tmp/bm_$name.log; cat /tmp/bm_$name.json
}

run r5_bench_1 python bench.py
run r5_bench_2 python bench.py

SCFG="--size 7b --quant int4 --act-quant --ffn-kernel --kv-quant int8 \
      --lanes 32 --steps-per-sync 32 --volumes 16 --new-tokens 64"
run r5_stream_devres python bench_stream.py $SCFG --device-resident

run r5_stream_auto_burst python bench_stream.py $SCFG --device-resident \
  --spec-lookup 8 --spec-sample --spec-policy auto

run r5_stream_auto_trickle python bench_stream.py --size 7b --quant int4 \
  --act-quant --ffn-kernel --kv-quant int8 --lanes 32 --steps-per-sync 32 \
  --volumes 2 --new-tokens 64 --device-resident \
  --spec-lookup 8 --spec-sample --spec-policy auto

run r5_zeroshot_b4 python bench_zeroshot.py --size full --batch 4

echo "MATRIX-R5 DONE $(date +%H:%M:%S)"
