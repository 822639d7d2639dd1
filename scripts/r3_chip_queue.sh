#!/usr/bin/env bash
# Round-3 post-flagship chip queue: perf attribution, the prefetch A/B,
# the Ant plateau probe, PQL-D@16384 execution + bench-cache warm, and
# the AllegroHand update-ratio sweep — ordered so the highest-leverage
# evidence (BENCH_r03 inputs, PERF.md attribution) lands first and a
# mid-queue kill costs only the tail stages.
#
# Run AFTER the flagship training run exits (one TPU client at a time):
#   bash scripts/r3_chip_queue.sh [stage...]
# With no args, runs all stages in order.
set -u
cd "$(dirname "$0")/.."
RUNS=runs
LOG="$RUNS/r3_chip_queue.log"

run() {  # run <name> <cmd...> — log, never abort the queue on failure
    local name=$1; shift
    echo "=== $name @ $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
    "$@" 2>&1 | tee -a "$LOG"
    echo "--- exit=$? @ $(date -u +%H:%M:%S)" | tee -a "$LOG"
}

STAGES="${*:-all}"
stage() { [ "$STAGES" = all ] || case " $STAGES " in *" $1 "*) ;; *) return 1;; esac; }

# 1. Phase attribution + prefetch_batches A/B at the current Ant point
#    (PERF.md levers 1-2; VERDICT r2 next-step 4).
stage probe_ant && run perf_probe_ant \
    python -u scripts/perf_probe.py Ant 4096 8 0 1

# 2. Per-op trace at the current operating point (ipc=1 so iteration
#    boundaries are visible), then the text summary for PERF.md.
stage trace && run perf_trace \
    python -u scripts/train.py algo=pql task=Ant num_envs=4096 \
    algo.compute_dtype=bfloat16 algo.iters_per_call=1 max_step=2000000 \
    profile_dir="$RUNS/ant_prof" profile_iters=40 \
    algo.eval_freq=100000 algo.log_freq=100 logging.out_dir="$RUNS" \
    logging.run_name=ant_prof_run
stage trace && run trace_summary \
    python scripts/trace_summary.py "$RUNS/ant_prof" --iters 40 --top 40

# 3. Ant plateau probe: resume the flagship checkpoint with the
#    exploration-noise ladder ceiling dropped 0.8 -> 0.15. If the 2600
#    plateau is exploration-noise-limited, eval climbs; if it is a gait
#    optimum of the morphology, it stays flat. Checkpoint is COPIED so
#    the probe's periodic saves don't clobber the flagship artifact.
stage ant_decay && run ant_decay_prep \
    cp -r "$RUNS/ant_pql_tpu_ckpt" "$RUNS/ant_decay_ckpt"
stage ant_decay && run ant_decay \
    python -u scripts/train.py algo=pql task=Ant num_envs=4096 \
    algo.compute_dtype=bfloat16 algo.iters_per_call=4 \
    max_time=900 algo.eval_freq=1000 algo.log_freq=500 \
    algo.noise.std_max=0.15 \
    logging.out_dir="$RUNS" logging.run_name=ant_pql_tpu_decay \
    checkpoint_dir="$RUNS/ant_decay_ckpt" checkpoint_freq=200000

# 4. Full bench: banks every config (first-ever PQL-D@16384 execution,
#    VERDICT r2 next-step 7) AND warms the persistent compile cache so
#    the driver's round-end BENCH_r03 run lands all six configs.
stage bench && run bench \
    env PQL_BENCH_BUDGET_S=2100 python -u bench.py

# 5. AllegroHand@8192 update-ratio sweep on the chip (BASELINE config 4;
#    the CPU fallback table is already in PERF.md).
stage sweep && run ratio_sweep \
    python -u scripts/ratio_sweep.py task=AllegroHand num_envs=8192 \
    algo.compute_dtype=bfloat16 sweep=8:2,4:2,16:2,8:4,2:1 \
    seconds_per_point=150 out="$RUNS/ratio_sweep_allegro.json"

# 6. Cartpole attribution + prefetch A/B at the headline point.
stage probe_cartpole && run perf_probe_cartpole \
    python -u scripts/perf_probe.py Cartpole 4096 16 0 1

echo "=== r3_chip_queue done $(date -u +%H:%M:%S) ===" | tee -a "$LOG"
