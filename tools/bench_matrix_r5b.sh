#!/bin/bash
# Round-5 repair legs: the first r5 matrix ran the serving legs before two
# fixes landed — (a) shape-static batched-admission keys (first burst of
# each size paid eager-op compiles inside the measured wall), (b) the 3 ms
# admission window (instant submits let chunk 1 race the ingest thread),
# (c) auto-policy warmup covering BOTH tiers.  Re-measure the ceiling and
# the auto-policy burst with the fixes in.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 2700 "$@" >/tmp/bm_$name.json 2>/tmp/bm_$name.log
  echo "--- $name exit=$? tail:"; tail -6 /tmp/bm_$name.log; cat /tmp/bm_$name.json
}

SCFG="--size 7b --quant int4 --act-quant --ffn-kernel --kv-quant int8 \
      --lanes 32 --steps-per-sync 32 --volumes 16 --new-tokens 64"
run r5b_stream_devres python bench_stream.py $SCFG --device-resident

run r5b_stream_auto_burst python bench_stream.py $SCFG --device-resident \
  --spec-lookup 8 --spec-sample --spec-policy auto

echo "MATRIX-R5B DONE $(date +%H:%M:%S)"

run r5b_stream_auto_trickle python bench_stream.py --size 7b --quant int4 \
  --act-quant --ffn-kernel --kv-quant int8 --lanes 32 --steps-per-sync 32 \
  --volumes 2 --new-tokens 64 --device-resident \
  --spec-lookup 8 --spec-sample --spec-policy auto

echo "MATRIX-R5B+TRICKLE DONE $(date +%H:%M:%S)"
