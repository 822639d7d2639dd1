#!/usr/bin/env python
"""Benchmark: training throughput at the reference operating points.

Covers every BASELINE.json config that fits one chip (the driver runs
this single-chip; multi-host variants of configs 4-5 are exercised by
tests/test_multihost.py and __graft_entry__.dryrun_multichip):

1. Cartpole PQL,   4096 envs (headline — round-over-round continuity)
2. Ant PQL,        4096 envs
3. AllegroHand PQL, 8192 envs
4. Cartpole DDPG,  16 envs   (reference train_baselines.py path)
5. Cartpole PQL,   1024 envs
6. AllegroHand PQL-D, 16384 envs (distributional critic)

The headline metric is the flagship fused PQL step at 4096 envs (sim +
8 critic + 4 actor updates per env-step, batch 8192 — reference
pql_algo.yaml); every other config lands in ``extra``. vs_baseline is
against the driver north-star of 5M aggregate env-steps/s
(BASELINE.json); the reference repo publishes no throughput numbers
(BASELINE.md).

Robustness (round-2 post-mortem — BENCH_r02 was rc=124 with ZERO output
because one wedged backend init hung the whole all-or-nothing process):

- the orchestrator imports NO jax; every measurement runs in a
  subprocess so a hang is killable without losing earlier results;
- a backend health probe (init + one matmul) runs first under a hard
  deadline — a wedged axon tunnel yields an error JSON line within
  ~2 minutes instead of a silent timeout kill;
- a progress JSON line is printed (and flushed) after EVERY config, so
  a later hang can never erase what's already measured (last valid
  JSON line wins);
- every config has its own hard deadline, and the total budget
  (PQL_BENCH_BUDGET_S) is checked before each start;
- if the default backend's health probe fails, the whole bench retries
  on the CPU backend (platform=cpu_fallback in the output, 10× smaller
  measurement windows + a 4× smaller fused block so off-chip compile
  fits the deadline, cheap configs first) — a real labeled number
  beats an error sentinel when the tunnel is sick; if even the 4096-env
  headline can't land off-chip, the best smaller config's number is
  promoted to ``value`` with ``extra.value_config`` naming it.

Failed configs are reported as error strings, never silently dropped;
a failed headline keeps its diagnostic in ``headline_error``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

NORTH_STAR_STEPS_PER_S = 5_000_000.0
BUDGET_S = float(os.environ.get("PQL_BENCH_BUDGET_S", 900))
CONFIG_TIMEOUT_S = float(os.environ.get("PQL_BENCH_CONFIG_TIMEOUT_S", 360))
PROBE_TIMEOUT_S = float(os.environ.get("PQL_BENCH_PROBE_TIMEOUT_S", 120))
HEADLINE = "cartpole_pql_4096"
# headline first (banked early), perf-critical Ant next, then the two
# CHEAP configs (banked before any Allegro compile risk), and the
# compile-heavy Allegro pair last — PQL-D@16384 at the very end so its
# risk can't shadow anything else. The round-5 physics compile cuts
# (zero-folding + vectorized contacts) brought warm-cache Allegro
# startup to ~200 s and cold to minutes (was: tens of minutes); the
# Allegro pair keeps a longer leash for the cold case, and a progress
# line is banked after EVERY config so even a driver kill mid-config
# (BENCH_r02 post-mortem) keeps everything measured.
CONFIG_KEYS = [
    "cartpole_pql_4096",
    "ant_pql_4096",
    "cartpole_ddpg_16",
    "cartpole_pql_1024",
    "allegro_pql_8192",
    "allegro_pqld_16384",
]
CONFIG_TIMEOUTS = {
    "allegro_pql_8192": max(CONFIG_TIMEOUT_S, 600.0),
    "allegro_pqld_16384": max(CONFIG_TIMEOUT_S, 600.0),
}
# budget-clamp floor per config: the two Allegro configs need ~200 s even
# with a fully warm cache (init+warmup+block at 8-16k envs), so the
# generic 120 s floor guaranteed a timeout for whichever ran last
CLAMP_FLOORS = {
    "allegro_pql_8192": 240.0,
    "allegro_pqld_16384": 240.0,
}


# --------------------------------------------------------------------------
# worker side (runs in a subprocess; the only code here that imports jax)
# --------------------------------------------------------------------------


def _stage(name: str) -> None:
    """Progress marker: on a worker timeout the orchestrator's diagnostic
    tail shows the last stage reached (compile vs warmup vs measurement)."""
    print(f"[stage {time.strftime('%H:%M:%S')}] {name}", flush=True)


def _measure(agent, calls: int) -> float:
    """env-steps/s of agent.train_block (or train_iter) after burn-in."""
    import jax

    _stage("init")
    state = agent.init(jax.random.PRNGKey(agent.cfg.seed))
    _stage("warmup")
    state, _ = agent.warmup(state)
    step_fn = getattr(agent, "train_block", agent.train_iter)
    iters_per_call = getattr(agent, "iters_per_call", 1)
    # burn-in covers compile + first dispatch; on the CPU-fallback path
    # one call is enough (each call is ~50x slower than on-chip)
    burn = 1 if _calls_div() > 1 else 3
    _stage("compile+burnin")
    for _ in range(burn):
        state, metrics = step_fn(state)
    jax.block_until_ready(metrics)
    _stage(f"measure calls={calls}")
    t0 = time.perf_counter()
    for _ in range(calls):
        state, metrics = step_fn(state)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    iters = calls * iters_per_call
    return iters * agent.cfg.algo.horizon_len * agent.cfg.num_envs / dt


def _pql(task: str, num_envs: int, calls: int, **algo_kw) -> float:
    from pql_tpu.algos.pql import PQL
    from pql_tpu.cfg import make_config

    kw: dict[str, object] = dict(
        # TPU-tuned operating point: bf16 network compute (params stay
        # fp32) and 16 fused iterations per dispatch
        algo__compute_dtype="bfloat16",
        algo__iters_per_call=16,
    )
    if _calls_div() > 1:
        # CPU fallback: shrink the compile surface — the ipc=16 unrolled
        # block alone can take >10 min to compile on a loaded CPU (the
        # round-3 dry run timed out exactly there). f32 beats emulated
        # bf16 off-chip; a short warm-up still fills one batch.
        kw["algo__iters_per_call"] = 4
        kw["algo__compute_dtype"] = "float32"
        kw["algo__warm_up"] = max(4, 8192 // num_envs + 1)
    kw.update(algo_kw)
    cfg = make_config("pql", task=task, num_envs=num_envs, logging__mode="off", **kw)
    return _measure(PQL(cfg), calls)


def _ddpg(task: str, num_envs: int, calls: int) -> float:
    from pql_tpu.algos import get_algo
    from pql_tpu.cfg import make_config
    from pql_tpu.envs import make_env

    cfg = make_config(
        "ddpg",
        task=task,
        num_envs=num_envs,
        algo__batch_size=min(8192, num_envs * 64),
        algo__memory_size=1_000_000,
        logging__mode="off",
    )
    return _measure(get_algo("DDPG")(cfg, make_env(cfg)), calls)


def _calls_div() -> int:
    """PQL_BENCH_CALLS_DIV shrinks every measurement window by the same
    factor — used by the CPU-fallback path where each call is ~50×
    slower than on-chip and the per-config deadline would otherwise hit."""
    return max(int(os.environ.get("PQL_BENCH_CALLS_DIV", "1")), 1)


def _run_config(key: str) -> float:
    div = _calls_div()
    c = lambda n: max(n // div, 4)  # noqa: E731
    thunks = {
        "cartpole_pql_4096": lambda: _pql("Cartpole", 4096, calls=c(50)),
        "cartpole_ddpg_16": lambda: _ddpg("Cartpole", 16, calls=c(200)),
        "cartpole_pql_1024": lambda: _pql("Cartpole", 1024, calls=c(50)),
        "ant_pql_4096": lambda: _pql("Ant", 4096, calls=c(40)),
        "allegro_pql_8192": lambda: _pql("AllegroHand", 8192, calls=c(20)),
        "allegro_pqld_16384": lambda: _pql(
            "AllegroHand", 16384, calls=c(10),
            algo__distl=True, algo__cri_class="DoubleQ",
            algo__memory_size=2_000_000,
        ),
    }
    return thunks[key]()


def _maybe_force_platform() -> None:
    """PQL_BENCH_PLATFORM=cpu forces the backend in-process (this image's
    site hook pre-imports jax, so JAX_PLATFORMS from the shell is too
    late) — used to exercise the bench off-chip."""
    plat = os.environ.get("PQL_BENCH_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def worker_main(key: str) -> None:
    _maybe_force_platform()
    from pql_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    value = _run_config(key)
    # last line of worker stdout is the result contract
    print(json.dumps({"key": key, "steps_per_s": round(value, 1)}), flush=True)


def probe_main() -> None:
    """Backend health check: init + one matmul, report the platform."""
    _maybe_force_platform()
    import jax
    import jax.numpy as jnp

    d = jax.devices()
    x = jnp.ones((256, 256))
    jax.block_until_ready(x @ x)
    print(json.dumps({"ok": True, "platform": d[0].platform, "n": len(d)}), flush=True)


# --------------------------------------------------------------------------
# orchestrator side (stdlib only — must survive a wedged backend)
# --------------------------------------------------------------------------


def _last_json_line(text: str) -> dict | None:
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def _run_subprocess(
    args: list[str], timeout: float, env_extra: dict[str, str] | None = None
) -> tuple[dict | None, str]:
    """Run ``python bench.py <args>`` in its own process group with a hard
    deadline; returns (parsed last JSON line, diagnostic string)."""
    cmd = [sys.executable, "-u", os.path.abspath(__file__), *args]
    try:
        proc = subprocess.run(
            cmd,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            timeout=timeout,
            text=True,
            start_new_session=True,  # killable as a group on timeout
            env={**os.environ, **(env_extra or {})},
        )
    except subprocess.TimeoutExpired as e:
        out = e.stdout or b""
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        return None, f"timeout after {timeout:.0f}s; tail: " + out[-200:].replace("\n", " | ")
    out = proc.stdout or ""
    parsed = _last_json_line(out)
    if proc.returncode != 0:
        return None, f"rc={proc.returncode}; tail: " + out[-300:].replace("\n", " | ")
    return parsed, out[-300:]


def _emit(value: float, extra: dict) -> None:
    print(
        json.dumps(
            {
                "metric": "pql_env_steps_per_s",
                "value": value,
                "unit": "env_steps/s",
                "vs_baseline": round(value / NORTH_STAR_STEPS_PER_S, 4),
                "extra": extra,
            }
        ),
        flush=True,
    )


def main() -> None:
    t_start = time.perf_counter()
    extra: dict[str, object] = {}

    worker_env: dict[str, str] = {}
    keys = CONFIG_KEYS
    probe, diag = _run_subprocess(["--probe"], PROBE_TIMEOUT_S)
    if not (probe and probe.get("ok")):
        # the default backend (axon tunnel) is wedged — fall back to a
        # CPU-backend measurement rather than losing the round's number.
        # The emitted value is clearly labeled (platform=cpu_fallback)
        # and the window is shrunk 10× so each config fits its deadline.
        cpu_env = {"PQL_BENCH_PLATFORM": "cpu", "PQL_BENCH_CALLS_DIV": "10"}
        probe, cpu_diag = _run_subprocess(["--probe"], PROBE_TIMEOUT_S, cpu_env)
        if not (probe and probe.get("ok")):
            extra["error"] = (
                f"backend health probe failed within {PROBE_TIMEOUT_S:.0f}s "
                f"(wedged axon tunnel?): {diag}; CPU fallback also failed: {cpu_diag}"
            )
            for key in CONFIG_KEYS:
                extra[key] = "skipped_backend_down"
            _emit(-1.0, extra)
            return
        worker_env = cpu_env
        extra["platform"] = "cpu_fallback"
        extra["error_default_backend"] = diag[:200]
        # CPU fallback: cheap configs FIRST (bank real numbers before the
        # expensive 4096-env headline, which can eat the whole budget on a
        # loaded box); the scalar-physics AllegroHand traces alone would
        # blow the budget off-chip, so they stay skipped
        keys = ["cartpole_ddpg_16", "cartpole_pql_1024", HEADLINE]
        for key in CONFIG_KEYS:
            if key not in keys:
                extra[key] = "skipped_backend_down"
    else:
        extra["platform"] = probe.get("platform")

    headline_value = -1.0
    cache_env: dict[str, str] = {}
    queue = list(keys)
    while queue:
        key = queue.pop(0)
        elapsed = time.perf_counter() - t_start
        if key != HEADLINE and elapsed > BUDGET_S:
            extra[key] = "skipped_budget"
            continue
        # clamp the per-config leash to the remaining budget (floor 120 s)
        # so one expensive tail config can't push total runtime far past
        # BUDGET_S — the driver kills by wall-clock, and a kill mid-config
        # wastes the leash a cheaper config could have used. The HEADLINE
        # is exempt (like the skipped_budget check above): on the
        # CPU-fallback path it runs last, and a clamped 120 s leash is
        # below its off-chip compile time — the headline number matters
        # more than the total-budget overshoot.
        leash = CONFIG_TIMEOUTS.get(key, CONFIG_TIMEOUT_S)
        if key != HEADLINE:
            leash = min(leash, max(BUDGET_S - elapsed, CLAMP_FLOORS.get(key, 120.0)))
        result, diag = _run_subprocess(
            ["--worker", key], leash, {**worker_env, **cache_env}
        )
        if result is None and "INVALID_ARGUMENT" in diag and not cache_env:
            # stale persistent-cache executables: the axon compile server
            # restarts occasionally, after which cached TPU executables
            # fail to LOAD with an opaque INVALID_ARGUMENT (observed
            # 2026-08-20; a fresh cache dir fixed it immediately). Divert
            # this and all remaining configs to a fresh cache dir and
            # retry this one once.
            cache_env = {"PQL_TPU_CACHE_DIR": "/tmp/pql_bench_fresh_cache"}
            extra["stale_cache_retry_from"] = key
            result, diag = _run_subprocess(
                ["--worker", key], leash, {**worker_env, **cache_env}
            )
        if result and "steps_per_s" in result:
            value = float(result["steps_per_s"])
            if key == HEADLINE:
                headline_value = value
            else:
                extra[key] = value
        else:
            if key == HEADLINE:
                extra["headline_error"] = diag
            else:
                extra[key] = "error: " + diag
            if not worker_env:
                # r4 post-mortem: the axon tunnel can wedge MID-bench,
                # after a healthy opening probe — every later TPU config
                # then hangs at init and the round banks -1.0. On any
                # on-chip config failure, re-probe the backend; if it is
                # now dead, divert the remaining budget to the CPU
                # fallback (cheap configs + headline, clearly labeled)
                # instead of burning it on more hangs.
                probe2, probe2_diag = _run_subprocess(["--probe"], PROBE_TIMEOUT_S)
                if not (probe2 and probe2.get("ok")):
                    worker_env = {
                        "PQL_BENCH_PLATFORM": "cpu",
                        "PQL_BENCH_CALLS_DIV": "10",
                    }
                    extra["platform"] = "cpu_fallback_midbench"
                    extra["error_default_backend"] = (
                        f"wedged after {key}: " + probe2_diag[:160]
                    )
                    retry = ["cartpole_ddpg_16", "cartpole_pql_1024", HEADLINE]
                    for k in queue:
                        if k not in retry:
                            extra[k] = "skipped_backend_down"
                    queue = [k for k in retry if not isinstance(extra.get(k), float)]
        # bank progress after EVERY config — a later hang/kill (or the
        # driver's own deadline) can never erase what's already measured;
        # the last valid JSON line wins
        _emit(headline_value, dict(extra, partial=True))

    if headline_value < 0:
        # the 4096-env headline didn't land (wedged tunnel, compile blowup,
        # whatever): promote the best banked REAL number on ANY path rather
        # than emitting -1 — r4 banked cartpole_ddpg_16=7378.5 and still
        # reported -1.0 because this promotion was gated on the CPU
        # fallback. A real labeled number always beats an error sentinel.
        # Preference order = closest to the headline operating point first.
        for key in (
            "ant_pql_4096",
            "cartpole_pql_1024",
            "allegro_pql_8192",
            "allegro_pqld_16384",
            "cartpole_ddpg_16",
        ):
            if isinstance(extra.get(key), float):
                headline_value = extra[key]
                extra["value_config"] = key
                break
    _emit(headline_value, extra)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--probe":
        probe_main()
    elif len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker_main(sys.argv[2])
    else:
        main()
