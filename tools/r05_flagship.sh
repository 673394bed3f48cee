#!/bin/bash
# Round-5 flagship evaluation pipeline (VERDICT r4 next #2/#3/#8).
#
# Produces ACCURACY_r05's inputs: per-SNR song/near/exact accuracy of the
# trained flagship (d=128/h=1024/u=32, 100 epochs, out/models/flagship)
# on a cover-calibrated eval set over a 31.7k-track DB, at BOTH 10 s
# (reference protocol: 2000 queries/SNR, tools/fit.py:7 comparison) and
# 60 s (MIREX-length, tools/mirexacc.py protocol) query lengths.
#
# COVER_SUB is the per-note substitution probability chosen by
# tools/r05_calibrate.sh (lower = covers more similar = harder).
#
# DB composition (one merged dir, out/dbs/flagship_r5):
#   out/dbs/flagship_30kbase  30,000 tracks (r4 corpus) re-embedded by
#                             the flagship — distractor mass
#   out/synth_r5              1,500 sibling/dummy + 500 test tracks, 30 s,
#                             family_size 4, cover-frac 1.0 — the 10 s sets
#   out/synth_r5m             120 sibling + 40 test tracks, 90 s — the
#                             60 s sets (tracks must exceed query length)
#
#   nohup bash tools/r05_flagship.sh > /tmp/r05.log 2>&1 &
set -e -x
cd "$(dirname "$0")/.."

COVER_SUB=${COVER_SUB:?set COVER_SUB=0.NN from tools/r05_calibrate.sh}
NQ10=${NQ10:-2000}
NQ60=${NQ60:-400}
COVER_JITTER=${COVER_JITTER:-0.06}
SNRS="-6 -4 -2 0 2 4 6 8"
# corpus roots are overridable so sub-specific corpora generated during
# the calibration window can be slotted in without renaming (db.txt
# records root-relative paths)
R5_ROOT=${R5_ROOT:-out/synth_r5}
R5M_ROOT=${R5M_ROOT:-out/synth_r5m}

# --- corpora (host synth; skip if already generated) -------------------
if [ ! -f "$R5_ROOT/lists/db.txt" ]; then
  python tools/make_synth_corpus.py --root "$R5_ROOT" \
    --train-songs 0 --val-songs 0 --db-songs 1500 --test-songs 500 \
    --seconds 30 --family-size 4 --cover-frac 1.0 \
    --cover-sub "$COVER_SUB" --cover-jitter "$COVER_JITTER" --seed 71
fi
if [ ! -f "$R5M_ROOT/lists/db.txt" ]; then
  python tools/make_synth_corpus.py --root "$R5M_ROOT" \
    --train-songs 0 --val-songs 0 --db-songs 120 --test-songs 40 \
    --seconds 90 --family-size 4 --cover-frac 1.0 \
    --cover-sub "$COVER_SUB" --cover-jitter "$COVER_JITTER" --seed 72
fi
python tools/mk_gentest.py "$R5_ROOT" gentest_r5 --model flagship
python tools/mk_gentest.py "$R5M_ROOT" gentest_r5m --model flagship

# --- one shard build + merge (one process: the tunneled TPU pays a
# multi-minute jit compile per process) ---------------------------------
cat "$R5_ROOT/lists/db.txt" "$R5M_ROOT/lists/db.txt" > /tmp/r5_shard.txt
python builder.py /tmp/r5_shard.txt out/dbs/r5_shard out/models/flagship
python tools/merge_dbs.py out/dbs/flagship_r5 \
  out/dbs/flagship_30kbase out/dbs/r5_shard

# --- query sets ---------------------------------------------------------
for snr in $SNRS; do
  python genquery.py --params configs/gentest_r5_snr$snr.json \
    --len 10 --num $NQ10 --mode test --out out/queries/r5_snr$snr --yes
  python genquery.py --params configs/gentest_r5m_snr$snr.json \
    --len 60 --num $NQ60 --mode test --out out/queries/r5m_snr$snr --yes
done

# --- match (one process for all 16 sets) --------------------------------
pairs=()
for snr in $SNRS; do
  pairs+=("out/queries/r5_snr$snr/list.txt"  "out/results/flagship_r5_snr$snr.txt")
  pairs+=("out/queries/r5m_snr$snr/list.txt" "out/results/flagship_r5m_snr$snr.txt")
done
python matcher.py --pairs --batch 128 out/dbs/flagship_r5 "${pairs[@]}"

# --- accuracy ------------------------------------------------------------
for len in r5 r5m; do
  for snr in $SNRS; do
    echo "set=$len snr=$snr"
    python tools/accuracy.py out/queries/${len}_snr$snr/expected.csv \
      out/results/flagship_${len}_snr${snr}_detail.csv
  done
done
echo R05_PIPELINE_DONE
