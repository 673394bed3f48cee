#!/bin/bash
# Round-3 ensemble pipeline: regenerate the v2 family corpus, retrain,
# rebuild both systems, and evaluate per SNR at 10 s and 3 s.
# (v2 corpus: tools/make_synth_corpus.py families — the regime where the
# NN/landmark disagreement set is non-trivial; VERDICT r2 next #2.)
#
#   nohup bash tools/run_synth_pipeline.sh > /tmp/pipeline.log 2>&1 &
set -e -x
cd "$(dirname "$0")/.."

# stale preprocess caches are keyed by file NAME — regeneration reuses
# names, so a stale cache silently evaluates the old corpus.  The model
# dir must go too: a FINISHED model refuses to retrain (the resume
# contract), silently keeping the old-corpus weights.
rm -rf caches/* out/synth_dataset out/models/synth

python tools/make_synth_corpus.py --db-songs 1000
python train.py -p configs/synth.json -w 2
./genall.sh gentest_synth synth 2000 10
./genall.sh gentest_synth synth3s 2000 3
./testall.sh synth synth -build -match_snr -accuracy_snr
./testall.sh synth synth3s -match_snr -accuracy_snr
./testall.sh lm synth -build -match_snr -accuracy_snr
./testall.sh lm synth3s -match_snr -accuracy_snr
python ensemble/fuse_synth.py --dataset synth3s --out out/ensemble3s

# frame_shift_mul sweep (VERDICT r2 next #4): quantify the exact-match
# lift of fsm=2/4 on the 10 s sets — fsm is a query-time knob, the DB
# variants are symlinks (tools/make_fsm_db.py)
for fsm in 2 4; do
  python tools/make_fsm_db.py out/dbs/synth_synth out/dbs/fsm${fsm}_synth ${fsm}
  pairs=()
  for snr in -6 -4 -2 0 2 4 6 8; do
    pairs+=("out/queries/synth_snr${snr}/list.txt"
            "out/results/fsm${fsm}_synth_snr${snr}.txt")
  done
  python matcher.py --pairs --batch 128 out/dbs/fsm${fsm}_synth "${pairs[@]}"
  for snr in -6 -4 -2 0 2 4 6 8; do
    echo "fsm=${fsm} snr=${snr}"
    python tools/accuracy.py out/queries/synth_snr${snr}/expected.csv \
      out/results/fsm${fsm}_synth_snr${snr}_detail.csv
  done
done
echo PIPELINE_DONE
