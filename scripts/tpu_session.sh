#!/usr/bin/env bash
# Unattended TPU work queue for a recovered axon tunnel — runs the round's
# chip-bound deliverables in priority order, logging to $RUNS:
#   1. flagship learning runs (Ant 3600 s, AllegroHand 4800 s  — the
#      BASELINE.json north-star budgets, reference common.py:172-182)
#   2. AllegroHand@8192 update-ratio sweep (BASELINE config 4)
#   3. profiled Ant perf probe (trace → scripts/trace_summary.py)
#   4. bench.py snapshot
# Rules (see .claude memory): ONE TPU client at a time, keep the single
# CPU core free while tracing, never kill a client mid-compile — every
# stage exits via max_time/its own completion.
set -uo pipefail
cd "$(dirname "$0")/.."

RUNS=${RUNS:-runs}
LOG="$RUNS/tpu_session.log"
mkdir -p "$RUNS"
echo "=== tpu_session start $(date -u +%H:%M:%S) ===" | tee -a "$LOG"

run() {  # run <name> <cmd...> — log, never abort the queue on failure
    echo "--- $1 @ $(date -u +%H:%M:%S)" | tee -a "$LOG"
    shift
    "$@" >>"$LOG" 2>&1
    echo "--- exit=$? @ $(date -u +%H:%M:%S)" | tee -a "$LOG"
}

# NOTE on frequencies: gates are in outer iterations, and on-chip one
# iteration is ~6 ms — eval_freq=2000 ≈ one eval every ~12 s, and
# checkpoint_freq=200000 ≈ one full-state (incl. ~2 GB replay) save
# every ~20 min. Don't copy the CPU-run frequencies (eval_freq=100)
# here: at chip speed they fire every fraction of a second.
run flagship_ant python -u scripts/train.py algo=pql task=Ant num_envs=4096 \
    algo.compute_dtype=bfloat16 algo.iters_per_call=4 \
    max_time=3600 algo.eval_freq=2000 algo.log_freq=500 \
    logging.out_dir="$RUNS" logging.run_name=ant_pql_tpu \
    checkpoint_dir="$RUNS/ant_pql_tpu_ckpt" checkpoint_freq=200000

run flagship_allegro python -u scripts/train.py algo=pql task=AllegroHand num_envs=8192 \
    algo.compute_dtype=bfloat16 algo.iters_per_call=4 \
    max_time=4800 algo.eval_freq=2000 algo.log_freq=500 \
    logging.out_dir="$RUNS" logging.run_name=allegro_pql_tpu \
    checkpoint_dir="$RUNS/allegro_pql_tpu_ckpt" checkpoint_freq=200000

run learning_report python scripts/learning_report.py \
    "$RUNS/cartpole_pql_cpu_smoke" "$RUNS/cartpole_adaptive" \
    "$RUNS/ant_pql_cpu" "$RUNS/ant_pql_cpu_r3" "$RUNS/allegro_pql_cpu_r3" \
    "$RUNS/ant_pql_tpu" "$RUNS/allegro_pql_tpu" \
    thresholds=Ant:5000,AllegroHand:3000,Cartpole:450 out=LEARNING.md

run ratio_sweep python -u scripts/ratio_sweep.py task=AllegroHand num_envs=8192 \
    algo.compute_dtype=bfloat16 sweep=8:2,4:2,16:2,8:4,2:1 \
    seconds_per_point=240 out="$RUNS/ratio_sweep_allegro.json"

run perf_trace python -u scripts/train.py algo=pql task=Ant num_envs=4096 \
    algo.compute_dtype=bfloat16 algo.iters_per_call=1 max_step=2000000 \
    profile_dir="$RUNS/ant_prof" profile_iters=40 \
    algo.eval_freq=100000 algo.log_freq=100 logging.out_dir="$RUNS" \
    logging.run_name=ant_prof_run

run trace_summary python scripts/trace_summary.py "$RUNS/ant_prof" --iters 40 --top 40

# phase attribution + prefetch_batches A/B at the current perf point
run perf_probe_ant python -u scripts/perf_probe.py Ant 4096 8 0 1
run perf_probe_cartpole python -u scripts/perf_probe.py Cartpole 4096 16 0 1

run bench env PQL_BENCH_BUDGET_S=2400 python -u bench.py

echo "=== tpu_session done $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
