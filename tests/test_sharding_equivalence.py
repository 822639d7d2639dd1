"""Sharded == single-device golden tests (SURVEY §4: 'golden-value tests
that a sharded step == single-device step').

The sim phase derives every per-env random draw (exploration noise, env
dynamics, auto-resets, warm-up actions) from the env's GLOBAL index
(pql_tpu/ops/noise.py per_row_normal, pql_tpu/envs/base.py env_keys), so
the simulated experience stream is bitwise identical for any mesh size.
The learner phase samples each shard's LOCAL replay slice by design (the
reference's V/P learners likewise own independent buffers,
pql/algo/pql_v_learner.py:50-53), so after nonzero-lr updates the params
of different mesh layouts are statistically — not bitwise — equivalent;
the bitwise guarantee here is scoped to the simulation stream and the
psum'd normalizer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pql_tpu.cfg import make_config


def _run_pql(mesh_n: int, obs_norm: bool, iters: int = 3, lr: float = 0.0):
    from pql_tpu.algos.pql import PQL
    from pql_tpu.parallel import make_mesh

    cfg = make_config(
        "pql",
        task="PointMass",
        num_envs=16,
        algo__batch_size=64,
        algo__memory_size=4096,
        algo__warm_up=4,
        algo__horizon_len=1,
        algo__actor_lr=lr,
        algo__critic_lr=lr,
        algo__obs_norm=obs_norm,
        logging__mode="off",
    )
    agent = PQL(cfg, mesh=make_mesh(mesh_n))
    state = agent.init(jax.random.PRNGKey(3))
    state, _ = agent.warmup(state)
    for _ in range(iters):
        state, _ = agent.train_iter(state)
    fields = {
        k: np.asarray(state.replay.field(k))
        for k in ("obs", "action", "reward", "next_obs", "done")
    }
    rms = (
        np.asarray(state.obs_rms.mean),
        np.asarray(state.obs_rms.var),
        np.asarray(state.obs_rms.count),
    )
    return fields, rms, int(state.env_steps)


class TestShardedEqualsSingleDevice:
    def test_sim_stream_mesh_invariant(self):
        """obs_norm off + lr 0: the entire replay content after warm-up +
        3 iterations must match between a 1-device and an 8-device mesh
        run of the same seed. All RNG-derived bits are exactly equal by
        construction (global-index key derivation); the only residue is
        ulp-level actor-matmul differences from XLA tiling [16,d] vs
        [2,d] batches, so the assert is tight-tolerance, not bitwise
        (observed worst case: ~0.16% of actions off by 1 ulp)."""
        f1, _, steps1 = _run_pql(1, obs_norm=False)
        f8, _, steps8 = _run_pql(8, obs_norm=False)
        assert steps1 == steps8
        for k in f1:
            np.testing.assert_allclose(
                f1[k], f8[k], rtol=1e-5, atol=1e-6, err_msg=f"field {k}"
            )

    def test_normalizer_and_stream_match_with_obs_norm(self):
        """obs_norm on: the Welford merge is psum'd across shards, whose
        f32 reduction order differs by mesh size — moments and the
        (normalized-obs-driven) stream must agree to f32 tolerance."""
        f1, rms1, _ = _run_pql(1, obs_norm=True)
        f8, rms8, _ = _run_pql(8, obs_norm=True)
        for a, b in zip(rms1, rms8):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
        for k in f1:
            np.testing.assert_allclose(
                f1[k], f8[k], rtol=1e-4, atol=1e-5, err_msg=f"field {k}"
            )

    def test_learning_run_stays_equivalent_in_distribution(self):
        """With real learning (lr>0) the meshes sample different local
        batches, so params differ bitwise — but the psum'd/pmean'd math
        must keep them statistically close after a few iterations on a
        near-deterministic task: final obs-rms moments track each other."""
        _, rms1, _ = _run_pql(1, obs_norm=True, lr=5e-4, iters=4)
        _, rms8, _ = _run_pql(8, obs_norm=True, lr=5e-4, iters=4)
        np.testing.assert_allclose(rms1[2], rms8[2])  # counts identical
        np.testing.assert_allclose(rms1[0], rms8[0], rtol=0.05, atol=0.05)


class TestEnvKeyDerivation:
    def test_vecenv_reset_matches_sharded_halves(self):
        """reset(key) over 8 envs == concat(reset over envs [0..4) with
        global_start 0, reset over [4..8) with global_start 4)."""
        from pql_tpu.envs import make_task
        from pql_tpu.envs.base import VecEnv

        task = make_task("PointMass")
        full = VecEnv(task, 8)
        half = VecEnv(task, 4)
        k = jax.random.PRNGKey(11)
        _, obs_full = full.reset(k)
        _, obs_lo = half.reset(k, global_start=0)
        _, obs_hi = half.reset(k, global_start=4)
        np.testing.assert_array_equal(
            np.asarray(obs_full), np.concatenate([obs_lo, obs_hi])
        )

    def test_vecenv_step_matches_sharded_halves(self):
        from pql_tpu.envs import make_task
        from pql_tpu.envs.base import VecEnv

        task = make_task("PointMass")
        full = VecEnv(task, 8)
        half = VecEnv(task, 4)
        k = jax.random.PRNGKey(11)
        s_full, _ = full.reset(k)
        s_lo, _ = half.reset(k, global_start=0)
        s_hi, _ = half.reset(k, global_start=4)
        act = jnp.linspace(-1.0, 1.0, 8 * task.action_dim).reshape(8, task.action_dim)
        k2 = jax.random.PRNGKey(12)
        _, obs_f, rew_f, done_f, _ = full.step(s_full, act, k2)
        _, obs_a, rew_a, _, _ = half.step(s_lo, act[:4], k2, global_start=0)
        _, obs_b, rew_b, _, _ = half.step(s_hi, act[4:], k2, global_start=4)
        np.testing.assert_array_equal(np.asarray(obs_f), np.concatenate([obs_a, obs_b]))
        np.testing.assert_array_equal(np.asarray(rew_f), np.concatenate([rew_a, rew_b]))
