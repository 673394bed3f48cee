#!/bin/bash
# Round-4 phase 3: the rescued screen (stage-3 exhaustive rescue,
# production default screen_rescue=0.4) across every SNR, then the
# final report.  Run after tools/r04_pipeline.sh.
set -ue
cd "$(dirname "$0")/.."
export PFANN_COMPILE_CACHE="${PFANN_COMPILE_CACHE:-.jax_tpu_cache}"
SNRS="-6 -4 -2 0 2 4 6 8"

step() { echo "=== [$(date +%H:%M:%S)] $*"; }

# force the screen engine: since the auto threshold moved to 30k songs
# this 20k DB would otherwise serve the exhaustive align engine, making
# the rescue table a trivial control-vs-control comparison
python tools/make_variant_db.py out/dbs/synth_synth out/dbs/rescued_synth \
  '{"screen": true, "screen_rescue": 0.4}'

for snr in $SNRS; do
  step "rescued snr $snr"
  python matchemb.py --batch 128 "out/qemb/synth_snr${snr}" \
    out/dbs/rescued_synth "out/results/rescued_synth_snr${snr}.txt"
  python tools/accuracy.py "out/queries/synth_snr${snr}/expected.csv" \
    "out/results/rescued_synth_snr${snr}_detail.csv"
done

step "db throughput with rescue (worst-case noisy mix)"
python bench.py --db out/dbs/rescued_synth | tail -1 | tee BENCH_r04_db_rescued.json

step report
python tools/r04_report.py
step done
