"""Diagnose where AllegroHand trace/compile time goes (round-5 item 3).

Usage: python scripts/compile_probe.py [task] [n_devices]
Times, separately: agent construction, init compile, warmup compile,
train_iter lower (trace) and compile; prints jaxpr eqn counts for the
physics substep body and the fused step.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n_dev = int(sys.argv[2]) if len(sys.argv) > 2 else 8
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={n_dev}"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

task = sys.argv[1] if len(sys.argv) > 1 else "AllegroHand"

t0 = time.perf_counter()


def mark(label):
    global t0
    t1 = time.perf_counter()
    print(f"[{t1 - t0:8.1f}s] {label}", flush=True)
    t0 = t1


# ---- raw physics substep jaxpr size -------------------------------------
from pql_tpu.envs import make_task  # noqa: E402

tsk = make_task(task)
if hasattr(tsk, "model"):
    import numpy as np

    rng = jax.random.PRNGKey(0)
    st = tsk.init_state(rng)
    act = jnp.zeros(tsk.action_dim)
    jaxpr = jax.make_jaxpr(lambda s, a: tsk.dynamics(s, a, rng))(st, act)
    n_eq = len(jaxpr.jaxpr.eqns)
    scan_sizes = [
        len(e.params["jaxpr"].jaxpr.eqns)
        for e in jaxpr.jaxpr.eqns
        if e.primitive.name == "scan"
    ]
    mark(f"dynamics jaxpr: {n_eq} outer eqns, scan body sizes {scan_sizes}")

# ---- fused step at dryrun shapes ----------------------------------------
from pql_tpu.algos.pql import PQL  # noqa: E402
from pql_tpu.cfg import make_config  # noqa: E402
from pql_tpu.parallel import make_mesh  # noqa: E402

mesh = make_mesh(n_dev)
extra = {}
if task == "AllegroHand":
    extra = {"algo__distl": True, "algo__cri_class": "DoubleQ"}
cfg = make_config(
    "pql",
    task=task,
    num_envs=8 * n_dev,
    algo__batch_size=16 * n_dev,
    algo__memory_size=4096 * n_dev,
    algo__warm_up=4,
    logging__mode="off",
    **extra,
)
agent = PQL(cfg, mesh=mesh)
mark("agent constructed")
state = agent.init(jax.random.PRNGKey(0))
jax.block_until_ready(state.obs)
mark("init compiled+ran")
lowered_w = agent.warmup.lower(state)
mark("warmup lowered (trace)")
compiled_w = lowered_w.compile()
mark("warmup compiled")
state, _ = agent.warmup(state)
jax.block_until_ready(state.obs)
mark("warmup ran")
lowered = agent.train_iter.lower(state)
mark("train_iter lowered (trace)")
compiled = lowered.compile()
mark("train_iter compiled")
state, m = agent.train_iter(state)
jax.block_until_ready(m["train/critic_loss"])
mark("train_iter ran")
print("total: see marks above")
