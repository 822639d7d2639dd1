"""Task-suite contract tests for the full IGE-analog task family
(reference task table: pql/utils/common.py:159-182, 246-275)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compiles every task's physics (AllegroHand alone ~2 min CPU)

from pql_tpu.envs import TASK_REGISTRY, VecEnv, make_task

ALL_TASKS = sorted(TASK_REGISTRY)


class TestTaskContracts:
    @pytest.mark.parametrize("name", ALL_TASKS)
    def test_shapes_and_step(self, rng, name):
        task = make_task(name)
        env = VecEnv(task, 4)
        s, obs = env.reset(rng)
        assert obs.shape == (4, task.obs_dim)
        act = jnp.zeros((4, task.action_dim))
        s2, obs2, rew, done, info = env.step(s, act, rng)
        assert obs2.shape == (4, task.obs_dim)
        assert rew.shape == (4,) and done.shape == (4,)
        assert "truncated" in info
        assert np.all(np.isfinite(obs2)) and np.all(np.isfinite(rew))

    @pytest.mark.parametrize("name", ALL_TASKS)
    def test_rollout_stays_finite(self, rng, name):
        """50 random-action steps under jit must not blow up."""
        task = make_task(name)
        env = VecEnv(task, 2)

        @jax.jit
        def run(rng):
            s, obs = env.reset(rng)

            def step(carry, key):
                s, _ = carry
                k_a, k_e = jax.random.split(key)
                act = jax.random.uniform(
                    k_a, (2, task.action_dim), jnp.float32, -1.0, 1.0
                )
                s, obs, rew, done, info = env.step(s, act, k_e)
                return (s, obs), (obs, rew)

            keys = jax.random.split(rng, 50)
            _, (obs_t, rew_t) = jax.lax.scan(step, (s, obs), keys)
            return obs_t, rew_t

        obs_t, rew_t = run(rng)
        assert np.all(np.isfinite(obs_t)), name
        assert np.all(np.isfinite(rew_t)), name


class TestNewTasks:
    def test_shadowhand_dims(self):
        t = make_task("ShadowHand")
        assert t.action_dim == 20 and t.obs_dim == 61

    def test_anymal_tracks_command(self, rng):
        t = make_task("Anymal")
        s = t.init_state(rng)
        assert s["cmd"].shape == (3,)
        obs = t.get_obs(s)
        np.testing.assert_allclose(obs[-3:], s["cmd"])

    def test_ballbalance_falls_off(self, rng):
        t = make_task("BallBalance")
        s = t.init_state(rng)
        s["ball"] = jnp.array([0.6, 0.0])
        _, r, d, info = t.dynamics(s, jnp.zeros(2), rng)
        assert bool(d) and float(r) < 0

    def test_franka_grasp_mechanic(self, rng):
        t = make_task("FrankaCubeStack")
        s = t.init_state(rng)
        # teleport cube A to the EE and close the gripper
        ee = t._ee_pos(s["q"])
        s["cube_a"] = ee
        act = jnp.zeros(8).at[7].set(1.0)
        ns, r, d, info = t.dynamics(s, act, rng)
        assert float(ns["grasped"]) == 1.0
        # release drops it
        act_open = jnp.zeros(8).at[7].set(-1.0)
        ns2, *_ = t.dynamics(ns, act_open, rng)
        assert float(ns2["grasped"]) == 0.0

    def test_humanoid_stays_up_briefly(self, rng):
        t = make_task("Humanoid")
        s = t.init_state(rng)
        for _ in range(5):
            s, r, d, _ = t.dynamics(s, jnp.zeros(8), rng)
        assert not bool(d)
