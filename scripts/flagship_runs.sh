#!/usr/bin/env bash
# Flagship learning runs (BASELINE.json north star): run each to the
# reference's wall-clock budget (pql/utils/common.py:172-182 — Ant 3600 s,
# AllegroHand 4800 s) on the real TPU chip, then render LEARNING.md.
#
# One run at a time — this box has 1 CPU core and the axon tunnel allows
# one healthy TPU client; NEVER kill a run mid-compile (wedges the remote
# server for 30+ min), always let max_time end it.
set -euo pipefail
cd "$(dirname "$0")/.."

RUNS=${RUNS:-runs}

python -u scripts/train.py algo=pql task=Ant num_envs=4096 \
    algo.compute_dtype=bfloat16 algo.iters_per_call=4 \
    max_time=3600 algo.eval_freq=100 algo.log_freq=50 \
    logging.out_dir="$RUNS" logging.run_name=ant_pql \
    checkpoint_dir="$RUNS/ant_pql_ckpt" checkpoint_freq=500

python -u scripts/train.py algo=pql task=AllegroHand num_envs=8192 \
    algo.compute_dtype=bfloat16 algo.iters_per_call=4 \
    max_time=4800 algo.eval_freq=100 algo.log_freq=50 \
    logging.out_dir="$RUNS" logging.run_name=allegro_pql \
    checkpoint_dir="$RUNS/allegro_pql_ckpt" checkpoint_freq=500

python scripts/learning_report.py "$RUNS/ant_pql" "$RUNS/allegro_pql" \
    thresholds=Ant:5000,AllegroHand:3000 out=LEARNING.md
