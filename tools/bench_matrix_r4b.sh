#!/bin/bash
# Round-4 session-3 on-chip legs (VERDICT r3 items #5, #7, #9 + the DICOM
# serving leg from #3):
#   * bench_zeroshot full leg — the COMPLETE zero-shot config incl. prompt
#     scoring, AUROC and artifact writes (VERDICT #7)
#   * flash_axial training A/B at the reference fine-tune geometry
#     (VERDICT #5: does the pallas bias-backward pay off end-to-end?)
#   * serving duty-cycle A/B: default (transport-bound relay reality) vs
#     --device-resident (pipeline overlap ceiling on this chip) at the
#     r3 best serving config (VERDICT weak #8 / next #9)
#   * DICOM-ingest serving leg (BASELINE config 5's named format)
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 2700 "$@" >/tmp/bm_$name.json 2>/tmp/bm_$name.log
  echo "--- $name exit=$? tail:"; tail -4 /tmp/bm_$name.log; cat /tmp/bm_$name.json
}

run r4b_zeroshot python bench_zeroshot.py --size full

run r4b_clip_flash   python bench_clip_train.py --size full
run r4b_clip_noflash python bench_clip_train.py --size full --no-flash-axial

SCFG="--size 7b --quant int4 --act-quant --ffn-kernel --kv-quant int8 \
      --lanes 32 --steps-per-sync 32 --volumes 16 --new-tokens 64"
run r4b_stream_base   python bench_stream.py $SCFG
run r4b_stream_devres python bench_stream.py $SCFG --device-resident
run r4b_stream_dicom  python bench_stream.py --size 7b --quant int4 \
  --act-quant --ffn-kernel --kv-quant int8 --lanes 32 --steps-per-sync 32 \
  --volumes 6 --new-tokens 64 --ingest-format dicom

echo "MATRIX-R4B DONE $(date +%H:%M:%S)"
