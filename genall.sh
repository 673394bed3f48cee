#!/bin/sh
# Generate the full per-SNR query test sets (parity: reference genall.sh).
# Usage: ./genall.sh [config_prefix] [out_prefix] [num_queries] [len_seconds]
#   defaults reproduce the reference: gentest configs, out2 sets,
#   2000 x 10 s queries per SNR.
# Synthetic-data run (after tools/make_synth_corpus.py):
#   ./genall.sh gentest_synth synth 200 10
PREFIX=${1:-gentest}
OUT=${2:-out2}
NUM=${3:-2000}
LEN=${4:-10}
for snr in -6 -4 -2 0 2 4 6 8
do
  python genquery.py --params configs/${PREFIX}_snr$snr.json --len $LEN --num $NUM --mode test --out out/queries/${OUT}_snr$snr --yes || exit 1
done
