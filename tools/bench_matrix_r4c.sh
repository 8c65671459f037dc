#!/bin/bash
# Round-4 session-4 on-chip legs (this session's changes):
#   * serving overlap ceiling RE-measure after the admission-priority fix
#     (bench_stream main loop drains all ready encodes before each chunk;
#     r4b measured 2.858 vol/s with 17 underfilled chunks for a 16-volume
#     burst — the fix should approach ⌈64/32⌉+admission chunks)
#   * bench_zeroshot --batch 4: batched+pipelined zero-shot pipeline
#     (r4b: 13.46 vol/s at per-volume sync; device itself was 23.4 ms/vol)
#   * sampled-spec serving: the VERDICT r3 "serving story" — speculation
#     under temperature 0.7 sampling (rejection acceptance) at the best
#     serving config, measured end-to-end on the burst workload
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 2700 "$@" >/tmp/bm_$name.json 2>/tmp/bm_$name.log
  echo "--- $name exit=$? tail:"; tail -4 /tmp/bm_$name.log; cat /tmp/bm_$name.json
}

SCFG="--size 7b --quant int4 --act-quant --ffn-kernel --kv-quant int8 \
      --lanes 32 --steps-per-sync 32 --volumes 16 --new-tokens 64"
run r4c_stream_devres python bench_stream.py $SCFG --device-resident

run r4c_zeroshot_b4 python bench_zeroshot.py --size full --batch 4

run r4c_stream_spec python bench_stream.py $SCFG --device-resident \
  --spec-lookup 8 --spec-sample

echo "MATRIX-R4C DONE $(date +%H:%M:%S)"
