#!/bin/bash
# Round-4 driver artifacts: sustained train throughput (VERDICT #3),
# DB-build throughput (#2), landmark extraction (#7), and the 100k
# scale point with the int8 double-rate coarse stage.  Serial — the
# tunneled chip and the single host core are both contended resources.
set -ue
cd "$(dirname "$0")/.."
export PFANN_COMPILE_CACHE="${PFANN_COMPILE_CACHE:-.jax_tpu_cache}"

step() { echo "=== [$(date +%H:%M:%S)] $*"; }

step train epoch
python bench.py --train-epoch configs/synth.json | tail -1 | tee BENCH_r04_train.json
step build
python bench.py --build 1000 | tail -1 | tee BENCH_r04_build.json
step landmark
python bench.py --lm 64 | tail -1 | tee BENCH_r04_landmark.json
step scale 100k f32 coarse
python bench.py --scale 100000 | tail -1 | tee BENCH_r04_scale.json
step scale 100k int8 coarse
BENCH_SCREEN_DTYPE=int8 python bench.py --scale 100000 | tail -1 \
  | tee BENCH_r04_scale_int8.json
step done
