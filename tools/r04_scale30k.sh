#!/bin/bash
# Round-4 follow-up: validate the screened engine at its TRUE
# auto-activation scale under the measured 30k-song threshold.
#
# The 20k family-corpus DB (ACCURACY_r04.md) is extended with 9,970
# freshly generated distractor songs (tools/make_synth_corpus.py,
# seed 777 — same generator family structure, disjoint stream), built
# as a separate shard and merged (tools/merge_dbs.py) into a
# 30,000-track DB.  At that count `Database` auto-upgrades align ->
# screen with NO config override — the engine serving the per-SNR
# harness is exactly the production auto path.  Query embeddings are
# the existing per-SNR sets (queries are DB-independent); the align
# control runs on a {"screen": false} variant of the same bytes.
set -ue
cd "$(dirname "$0")/.."
export PFANN_COMPILE_CACHE="${PFANN_COMPILE_CACHE:-.jax_tpu_cache}"
SNRS="-6 -4 -2 0 2 4 6 8"

step() { echo "=== [$(date +%H:%M:%S)] $*"; }

if [ ! -f out/synth30k_distract/lists/db.txt ]; then
  step generate 9,970 distractor songs
  python tools/make_synth_corpus.py --root out/synth30k_distract \
    --train-songs 0 --val-songs 0 --test-songs 0 \
    --db-songs 9970 --seconds 60 --seed 777
fi

if [ ! -f out/dbs/distract10k/embeddings ]; then
  step build distractor shard
  python builder.py out/synth30k_distract/lists/db.txt \
    out/dbs/distract10k out/models/synth
fi

step merge into the 30k DB
python tools/merge_dbs.py out/dbs/synth30k \
  out/dbs/synth_synth out/dbs/distract10k
python tools/make_variant_db.py out/dbs/synth30k out/dbs/alignctl30k \
  '{"screen": false}'

step match auto engine per SNR - one DB load for all sweeps
PAIRS=""
for snr in $SNRS; do
  PAIRS="$PAIRS out/qemb/synth_snr${snr} out/results/synth30k_snr${snr}.txt"
done
python matchemb.py --batch 128 --pairs out/dbs/synth30k $PAIRS

step match align control per SNR
PAIRS=""
for snr in $SNRS; do
  PAIRS="$PAIRS out/qemb/synth_snr${snr} out/results/alignctl30k_snr${snr}.txt"
done
python matchemb.py --batch 128 --pairs out/dbs/alignctl30k $PAIRS

step accuracy
for tag in synth30k alignctl30k; do
  for snr in $SNRS; do
    echo "model=$tag snr=$snr"
    python tools/accuracy.py "out/queries/synth_snr${snr}/expected.csv" \
      "out/results/${tag}_snr${snr}_detail.csv"
  done
done

step db throughput artifact at 30k
python bench.py --db out/dbs/synth30k | tail -1 | tee BENCH_r04_db30k.json
step done
