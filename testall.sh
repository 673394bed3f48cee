#!/bin/bash
# Orchestrate build -> match -> accuracy per model/dataset (the reference's
# evaluation harness contract):
#   ./testall.sh <model> <dataset> [-build] [-match] [-accuracy]
#                [-match_snr] [-accuracy_snr] [-match_snr_full] [-accuracy_snr_full]
# model:   baseline | shuffle_1000 | ... (any out/models/<model> dir; lm* = landmark system)
# dataset: inside | out1 | out2 | mirex
set -u

MODEL="$1"; DATASET="$2"; shift 2
SNRS="-6 -4 -2 0 2 4 6 8"
mkdir -p out/dbs out/results

db_list() {
  declare -A lists=(
    [inside]=lists/fma_medium_train.txt
    [out1]=lists/fma_out1.txt
    [out2]=lists/fma_out2.txt
    [mirex]=lists/mirex-db.txt
    [synth]=out/synth_dataset/lists/db.txt
    [synth2s]=out/synth_dataset/lists/db.txt
    [synth3s]=out/synth_dataset/lists/db.txt
    [synth5s]=out/synth_dataset/lists/db.txt
    # round-5 flagship eval: both query-length sets share the merged
    # 31.7k-track DB's own song list (tools/r05_flagship.sh), so the
    # landmark arm indexes the identical corpus
    [r5]=out/dbs/flagship_r5/songList.txt
    [r5m]=out/dbs/flagship_r5/songList.txt
  )
  if [[ -z "${lists[$DATASET]:-}" ]]; then
    echo "$DATASET is not a supported dataset" >&2
    exit 2
  fi
  echo "${lists[$DATASET]}"
}

match_prog() {
  # landmark-system models: the external ../pfa matcher if present
  # (reference setup), else this repo's self-contained one
  if [[ "$MODEL" == lm* ]]; then
    if [[ -x ../pfa/matcher ]]; then echo "../pfa/matcher";
    else echo "python lm_matcher.py"; fi
  else
    echo "python matcher.py"
  fi
}

db_name() {
  # query-length variants share their base dataset's DB (synth2s -> synth)
  case "$1" in
    synth2s|synth3s|synth5s) echo synth;;
    r5m) echo r5;;
    *) echo "$1";;
  esac
}

run_match() {   # $1 = query list, $2 = result path
  $(match_prog) "$1" "out/dbs/${MODEL}_$(db_name "$3")" "$2"
}

run_accuracy() {  # $1 = expected csv, $2 = result path
  if [[ "$MODEL" == lm* ]]; then
    python tools/accuracy.py "$1" "$2.csv"
  else
    python tools/accuracy.py "$1" "${2%.txt}_detail.csv"
  fi
}

for action in "$@"; do
  case "$action" in
    -build)
      if [[ "$MODEL" == lm* ]]; then
        python lm_builder.py "$(db_list)" \
          "out/dbs/${MODEL}_$(db_name "$DATASET")" || exit 1
      else
        python builder.py "$(db_list)" \
          "out/dbs/${MODEL}_$(db_name "$DATASET")" \
          "out/models/${MODEL}" || exit 1
      fi;;
    -match)
      if [[ "$DATASET" == mirex ]]; then
        run_match lists/mirex-query.txt "out/results/${MODEL}_${DATASET}.txt" "$DATASET" || exit 1
      else
        run_match "out/queries/${DATASET}/list.txt" "out/results/${MODEL}_${DATASET}.txt" "$DATASET" || exit 1
      fi;;
    -accuracy)
      if [[ "$DATASET" == mirex ]]; then
        python tools/mirexacc.py lists/mirex-answer.txt "out/results/${MODEL}_${DATASET}.txt" || exit 1
      else
        run_accuracy "out/queries/${DATASET}/expected.csv" "out/results/${MODEL}_${DATASET}.txt" || exit 1
      fi;;
    -match_snr)
      if [[ "$MODEL" == lm* ]]; then
        for snr in $SNRS; do
          run_match "out/queries/${DATASET}_snr${snr}/list.txt" \
            "out/results/${MODEL}_${DATASET}_snr${snr}.txt" "$DATASET" || exit 1
        done
      else
        # one matcher process for all SNR sets: model load + jit compile
        # dominate a cold run, --pairs amortizes them 8x
        pairs=()
        for snr in $SNRS; do
          pairs+=("out/queries/${DATASET}_snr${snr}/list.txt" \
                  "out/results/${MODEL}_${DATASET}_snr${snr}.txt")
        done
        python matcher.py --pairs --batch 128 "out/dbs/${MODEL}_$(db_name "$DATASET")" \
          "${pairs[@]}" || exit 1
      fi;;
    -accuracy_snr)
      for snr in $SNRS; do
        echo "snr=$snr"
        run_accuracy "out/queries/${DATASET}_snr${snr}/expected.csv" \
          "out/results/${MODEL}_${DATASET}_snr${snr}.txt" || exit 1
      done;;
    -match_snr_full)
      if [[ "$MODEL" == lm* ]]; then
        for snr in $SNRS; do
          $(match_prog) "out/queries/${DATASET}_snr${snr}/list.txt" \
            "out/dbs/${MODEL}_full" \
            "out/results/${MODEL}_${DATASET}_full_snr${snr}.txt" || exit 1
        done
      else
        pairs=()
        for snr in $SNRS; do
          pairs+=("out/queries/${DATASET}_snr${snr}/list.txt" \
                  "out/results/${MODEL}_${DATASET}_full_snr${snr}.txt")
        done
        python matcher.py --pairs --batch 128 "out/dbs/${MODEL}_full" "${pairs[@]}" || exit 1
      fi;;
    -accuracy_snr_full)
      for snr in $SNRS; do
        echo "snr=$snr"
        run_accuracy "out/queries/${DATASET}_snr${snr}/expected.csv" \
          "out/results/${MODEL}_${DATASET}_full_snr${snr}.txt" || exit 1
      done;;
    *) echo "unknown action $action" >&2; exit 2;;
  esac
done
