#!/bin/bash
# Round-4 screened-engine validation pipeline (VERDICT r3 next #1):
# build the 20,030-track DB from the v2 family corpus, extract the 8 SNR
# query sets' embeddings ONCE (extractemb), then match them through (a)
# the screen engine (forced via {"screen": true} — since the auto
# threshold moved to 30k songs this 20k DB defaults to align), (b) an
# exhaustive align control
# sharing the same embeddings (symlinked variant), and (c) screen-tuning
# variants (pool_k / top_m / int8 coarse) — per-SNR accuracy for each.
# Assumes out/models/synth is trained and out/queries/synth_snr* exist.
set -ue
cd "$(dirname "$0")/.."
# remote TPU compiles of the packed embed shapes take minutes; the
# persistent cache makes every pipeline process after the first warm
export PFANN_COMPILE_CACHE="${PFANN_COMPILE_CACHE:-.jax_tpu_cache}"
SNRS="-6 -4 -2 0 2 4 6 8"
mkdir -p out/dbs out/results out/qemb

step() { echo "=== [$(date +%H:%M:%S)] $*"; }

if [ ! -f out/dbs/synth_synth/embeddings ]; then
  step build 20k DB
  python builder.py out/synth_dataset/lists/db.txt out/dbs/synth_synth \
    out/models/synth
fi

step make align-control + screen-tuning variants
python tools/make_variant_db.py out/dbs/synth_synth out/dbs/alignctl_synth \
  '{"screen": false}'
python tools/make_variant_db.py out/dbs/synth_synth out/dbs/screen8_synth \
  '{"screen": true, "screen_pool_k": 8}'
python tools/make_variant_db.py out/dbs/synth_synth out/dbs/screenm16_synth \
  '{"screen": true, "screen_top_m": 16}'
python tools/make_variant_db.py out/dbs/synth_synth out/dbs/screeni8_synth \
  '{"screen": true, "screen_coarse_dtype": "int8"}'

step extract query embeddings once per SNR set
for snr in $SNRS; do
  if [ ! -f "out/qemb/synth_snr${snr}/query_embeddings" ]; then
    python extractemb.py "out/queries/synth_snr${snr}/list.txt" \
      out/dbs/synth_synth "out/qemb/synth_snr${snr}"
  fi
done

match_all() {  # $1 = db tag
  for snr in $SNRS; do
    python matchemb.py --batch 128 "out/qemb/synth_snr${snr}" \
      "out/dbs/$1_synth" "out/results/$1_synth_snr${snr}.txt"
  done
}

step make the screen-forced primary variant
python tools/make_variant_db.py out/dbs/synth_synth out/dbs/screenforce_synth \
  '{"screen": true}'
step match screen engine
match_all screenforce
step match align control
match_all alignctl

step accuracy
for tag in screenforce alignctl; do
  for snr in $SNRS; do
    echo "model=$tag snr=$snr"
    python tools/accuracy.py "out/queries/synth_snr${snr}/expected.csv" \
      "out/results/${tag}_synth_snr${snr}_detail.csv"
  done
done

step tuning variants on the worst SNR only
for tag in screen8 screenm16 screeni8; do
  python matchemb.py --batch 128 out/qemb/synth_snr-6 \
    "out/dbs/${tag}_synth" "out/results/${tag}_synth_snr-6.txt"
  echo "model=$tag snr=-6"
  python tools/accuracy.py out/queries/synth_snr-6/expected.csv \
    "out/results/${tag}_synth_snr-6_detail.csv"
done

step db throughput artifact
python bench.py --db out/dbs/synth_synth | tail -1 | tee BENCH_r04_db.json
python bench.py --db out/dbs/screenforce_synth | tail -1 | tee BENCH_r04_db_rescued.json
step done
