"""Contract tests for the bench.py ORCHESTRATOR (no jax, no subprocesses).

Round-2 post-mortem: BENCH_r02 was rc=124 with zero output because one
wedged backend init hung an all-or-nothing process. These tests pin the
hardened behavior by mocking ``_run_subprocess``:

- healthy backend: progress banked after every config (partial emits),
  extras filled;
- wedged default backend + healthy CPU: cpu_fallback run of the cheap
  configs, labeled, headline still a real number;
- both backends wedged: a parseable error JSON, never silence;
- headline failure keeps its diagnostic (``headline_error``);
- off-chip headline failure promotes the best smaller config's number
  to ``value`` with ``extra.value_config`` naming it.
"""

from __future__ import annotations

import importlib.util
import io
import json
import os
import sys
from contextlib import redirect_stdout

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _run_main(fake):
    """Run bench.main() with _run_subprocess replaced; return emitted JSON
    lines (parsed, in order)."""
    orig = bench._run_subprocess
    bench._run_subprocess = fake
    buf = io.StringIO()
    try:
        with redirect_stdout(buf):
            bench.main()
    finally:
        bench._run_subprocess = orig
    return [json.loads(l) for l in buf.getvalue().strip().splitlines() if l.startswith("{")]


def test_healthy_backend_banks_headline_early():
    calls = []

    def fake(args, timeout, env_extra=None):
        calls.append((tuple(args), env_extra or {}))
        if args[0] == "--probe":
            return {"ok": True, "platform": "axon", "n": 1}, ""
        return {"key": args[1], "steps_per_s": 1000.0 + len(calls)}, ""

    lines = _run_main(fake)
    # one partial emit per config (progress banked), then the final line
    assert len(lines) == len(bench.CONFIG_KEYS) + 1
    assert all(l["extra"].get("partial") is True for l in lines[:-1])
    # headline runs first on the healthy path: banked in the 1st emit
    assert lines[0]["value"] == lines[-1]["value"] > 0
    final = lines[-1]
    assert final["metric"] == "pql_env_steps_per_s"
    assert final["extra"]["platform"] == "axon"
    for key in bench.CONFIG_KEYS:
        if key != bench.HEADLINE:
            assert isinstance(final["extra"][key], float)


def test_wedged_default_backend_falls_back_to_cpu():
    def fake(args, timeout, env_extra=None):
        env_extra = env_extra or {}
        if args[0] == "--probe":
            if env_extra.get("PQL_BENCH_PLATFORM") == "cpu":
                return {"ok": True, "platform": "cpu", "n": 1}, ""
            return None, "timeout after 120s"  # wedged tunnel
        assert env_extra.get("PQL_BENCH_PLATFORM") == "cpu"  # workers forced
        assert env_extra.get("PQL_BENCH_CALLS_DIV") == "10"
        return {"key": args[1], "steps_per_s": 55.5}, ""

    lines = _run_main(fake)
    final = lines[-1]
    assert final["value"] == 55.5  # a real number, not -1
    assert final["extra"]["platform"] == "cpu_fallback"
    assert "error_default_backend" in final["extra"]
    # expensive scalar-physics configs skipped off-chip
    assert final["extra"]["allegro_pql_8192"] == "skipped_backend_down"
    assert final["extra"]["allegro_pqld_16384"] == "skipped_backend_down"
    assert final["extra"]["cartpole_ddpg_16"] == 55.5


def test_both_backends_wedged_emits_parseable_error():
    def fake(args, timeout, env_extra=None):
        return None, "timeout"

    lines = _run_main(fake)
    assert len(lines) == 1
    assert lines[0]["value"] == -1.0
    assert "error" in lines[0]["extra"]
    for key in bench.CONFIG_KEYS:
        assert lines[0]["extra"][key] == "skipped_backend_down"


def test_headline_failure_keeps_diagnostic():
    def fake(args, timeout, env_extra=None):
        if args[0] == "--probe":
            return {"ok": True, "platform": "axon", "n": 1}, ""
        if args[1] == bench.HEADLINE:
            return None, "rc=1; tail: OOM"
        return {"key": args[1], "steps_per_s": 10.0}, ""

    lines = _run_main(fake)
    final = lines[-1]
    # r4 post-mortem (VERDICT r5 item 2): a failed headline must NOT
    # produce -1 when real numbers were banked — the best banked config
    # is promoted to ``value`` and labeled, and the headline's own
    # diagnostic is preserved
    assert final["value"] == 10.0
    assert final["extra"]["value_config"] == "ant_pql_4096"
    assert "OOM" in final["extra"]["headline_error"]


def test_cpu_fallback_headline_timeout_promotes_small_config():
    """Tunnel down + the 4096-env headline times out off-chip: the bench
    must still report a real labeled number (round-3 dry-run scenario)."""

    def fake(args, timeout, env_extra=None):
        env_extra = env_extra or {}
        if args[0] == "--probe":
            if env_extra.get("PQL_BENCH_PLATFORM") == "cpu":
                return {"ok": True, "platform": "cpu", "n": 1}, ""
            return None, "timeout after 120s"
        if args[1] == bench.HEADLINE:
            return None, "timeout after 360s; tail: [stage] compile+burnin"
        return {"key": args[1], "steps_per_s": 123.4}, ""

    lines = _run_main(fake)
    final = lines[-1]
    assert final["value"] == 123.4
    assert final["extra"]["value_config"] == "cartpole_pql_1024"
    assert final["extra"]["platform"] == "cpu_fallback"
    assert "headline_error" in final["extra"]
    # cheap configs ran BEFORE the risky headline (banked first)
    partials = [l for l in lines[:-1] if l["extra"].get("partial")]
    assert isinstance(partials[0]["extra"].get("cartpole_ddpg_16"), float)


def test_tail_config_timeout_clamped_to_remaining_budget(monkeypatch):
    """One expensive tail config must not push total runtime far past
    BUDGET_S: its subprocess timeout is clamped to the remaining budget
    (floor 120 s), and a config starting past the budget is skipped."""
    clock = {"t": 0.0}
    monkeypatch.setattr(bench.time, "perf_counter", lambda: clock["t"])
    timeouts = {}

    def fake(args, timeout, env_extra=None):
        if args[0] == "--probe":
            clock["t"] += 10.0
            return {"ok": True, "platform": "axon", "n": 1}, ""
        timeouts[args[1]] = timeout
        clock["t"] += 200.0  # each config consumes 200 s of budget
        return {"key": args[1], "steps_per_s": 1000.0}, ""

    final = _run_main(fake)[-1]
    # early configs get their full leash (budget not yet binding)
    assert timeouts[bench.HEADLINE] == bench.CONFIG_TIMEOUT_S
    # allegro_pql_8192 starts at elapsed=810 of 900: leash 600 -> clamped
    # to its 240 s floor (remaining budget is only 90; the generic floor
    # is 120 but warm-cache Allegro inits alone need ~200 s)
    assert timeouts["allegro_pql_8192"] == 240.0
    # the last config starts past the budget entirely: skipped, not run
    assert final["extra"]["allegro_pqld_16384"] == "skipped_budget"
    assert "allegro_pqld_16384" not in timeouts


def test_midbench_wedge_diverts_to_cpu_and_banks_positive():
    """Replay of the r4 failure (VERDICT r5 item 2): the opening probe is
    healthy, then the tunnel wedges — the headline worker times out at
    init. The bench must re-probe, divert remaining configs to the CPU
    fallback, retry the headline there, and emit a positive labeled
    value — never -1."""
    state = {"wedged": False}

    def fake(args, timeout, env_extra=None):
        env_extra = env_extra or {}
        on_cpu = env_extra.get("PQL_BENCH_PLATFORM") == "cpu"
        if args[0] == "--probe":
            if on_cpu or not state["wedged"]:
                return {"ok": True, "platform": "cpu" if on_cpu else "axon", "n": 1}, ""
            return None, "timeout after 120s"
        # first worker call wedges the tunnel; everything TPU after hangs
        if not on_cpu:
            state["wedged"] = True
            return None, "timeout after 360s; tail: [stage] init"
        return {"key": args[1], "steps_per_s": 555.5}, ""

    lines = _run_main(fake)
    final = lines[-1]
    assert final["value"] == 555.5
    assert final["extra"]["platform"] == "cpu_fallback_midbench"
    assert "headline_error" in final["extra"]
    # the compile-heavy Allegro configs are not attempted off-chip
    assert final["extra"]["allegro_pqld_16384"] == "skipped_backend_down"


def test_stale_cache_invalid_argument_retries_with_fresh_cache_dir():
    """Stale persistent-cache executables (axon server restart) fail with
    INVALID_ARGUMENT at load; the bench must divert to a fresh cache dir
    and retry rather than losing every TPU config (2026-08-20 incident)."""
    calls = []

    def fake(args, timeout, env_extra=None):
        env_extra = env_extra or {}
        if args[0] == "--probe":
            return {"ok": True, "platform": "axon", "n": 1}, ""
        calls.append((args[1], env_extra.get("PQL_TPU_CACHE_DIR")))
        if env_extra.get("PQL_TPU_CACHE_DIR") is None:
            return None, "rc=1; tail: jax.errors.JaxRuntimeError: INVALID_ARGUMENT: TPU backend error"
        return {"key": args[1], "steps_per_s": 777.0}, ""

    lines = _run_main(fake)
    final = lines[-1]
    assert final["value"] == 777.0
    assert final["extra"]["stale_cache_retry_from"] == bench.HEADLINE
    # headline tried twice (stale then fresh); later configs go straight
    # to the fresh cache dir
    assert calls[0] == (bench.HEADLINE, None)
    assert calls[1] == (bench.HEADLINE, "/tmp/pql_bench_fresh_cache")
    assert all(c[1] == "/tmp/pql_bench_fresh_cache" for c in calls[1:])
