#!/bin/bash
# Resume of tools/r04_scale30k.sh after a session interruption:
# the 30k DB (out/dbs/synth30k, 30,000 songs / 1,411,080 embeddings)
# and SNR -6..2 auto-engine sweeps already completed; this finishes
# SNR 4..8, the align control, accuracy, and the throughput artifact.
set -ue
cd "$(dirname "$0")/.."
export PFANN_COMPILE_CACHE="${PFANN_COMPILE_CACHE:-.jax_tpu_cache}"

step() { echo "=== [$(date +%H:%M:%S)] $*"; }

step finish auto engine SNR 4 6 8
PAIRS=""
for snr in 4 6 8; do
  PAIRS="$PAIRS out/qemb/synth_snr${snr} out/results/synth30k_snr${snr}.txt"
done
python matchemb.py --batch 128 --pairs out/dbs/synth30k $PAIRS

step match align control per SNR
PAIRS=""
for snr in -6 -4 -2 0 2 4 6 8; do
  PAIRS="$PAIRS out/qemb/synth_snr${snr} out/results/alignctl30k_snr${snr}.txt"
done
python matchemb.py --batch 128 --pairs out/dbs/alignctl30k $PAIRS

step accuracy
for tag in synth30k alignctl30k; do
  for snr in -6 -4 -2 0 2 4 6 8; do
    echo "model=$tag snr=$snr"
    python tools/accuracy.py "out/queries/synth_snr${snr}/expected.csv" \
      "out/results/${tag}_snr${snr}_detail.csv"
  done
done

step db throughput artifact at 30k
python bench.py --db out/dbs/synth30k | tail -1 | tee BENCH_r04_db30k.json
step done
