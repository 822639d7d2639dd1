"""Environment substrate tests: shapes, auto-reset, timeout semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pql_tpu.envs import VecEnv, handle_timeout, make_task, TASK_REGISTRY


class TestVecEnv:
    @pytest.mark.slow  # compiles EVERY registered task's physics (~10 min);
    # the quick gate's per-task coverage lives in test_task_suite.py
    def test_all_tasks_step(self, rng):
        for name in TASK_REGISTRY:
            env = VecEnv(make_task(name), num_envs=8)
            state, obs = env.reset(rng)
            assert obs.shape == (8, env.obs_dim)
            actions = jnp.zeros((8, env.action_dim))
            state, obs, reward, done, info = jax.jit(env.step)(state, actions, rng)
            assert obs.shape == (8, env.obs_dim)
            assert reward.shape == (8,) and done.shape == (8,)
            assert "truncated" in info
            assert bool(jnp.all(jnp.isfinite(obs)))

    def test_truncation_at_time_limit(self, rng):
        env = VecEnv(make_task("Pendulum"), num_envs=4)  # never terminates early
        state, obs = env.reset(rng)
        step = jax.jit(env.step)
        for t in range(env.max_episode_length):
            state, obs, reward, done, info = step(state, jnp.zeros((4, 1)), jax.random.fold_in(rng, t))
        assert bool(jnp.all(done == 1.0))
        assert bool(jnp.all(info["truncated"]))
        # handle_timeout clears truncated dones (bootstrap through timeouts)
        assert bool(jnp.all(handle_timeout(done, info) == 0.0))
        # clocks were reset
        assert bool(jnp.all(state.time == 0))

    def test_auto_reset_on_termination(self, rng):
        env = VecEnv(make_task("Cartpole"), num_envs=64)
        state, obs = env.reset(rng)
        step = jax.jit(env.step)
        # drive hard to one side until some carts fall over
        saw_done = False
        for t in range(400):
            state, obs, reward, done, info = step(state, jnp.ones((64, 1)), jax.random.fold_in(rng, t))
            if bool(jnp.any(done > 0.5)):
                saw_done = True
                # next obs for done envs is a fresh episode: small state values
                done_idx = np.asarray(done) > 0.5
                assert np.all(np.abs(np.asarray(obs)[done_idx]) <= 0.11)
                break
        assert saw_done

    def test_cartpole_reward_shape_matches_ige(self, rng):
        """Upright, still pole → reward ≈ 1; fallen → -2."""
        env = VecEnv(make_task("Cartpole"), num_envs=2)
        state, obs = env.reset(rng)
        state, obs, reward, done, info = env.step(state, jnp.zeros((2, 1)), rng)
        assert float(reward[0]) > 0.9

    def test_deterministic_given_key(self, rng):
        env = VecEnv(make_task("PointMass"), num_envs=4)
        s1, o1 = env.reset(rng)
        s2, o2 = env.reset(rng)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))
        a = jnp.full((4, 2), 0.3)
        _, o1b, r1, *_ = env.step(s1, a, rng)
        _, o2b, r2, *_ = env.step(s2, a, rng)
        np.testing.assert_allclose(np.asarray(o1b), np.asarray(o2b))
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2))

    def test_success_info(self, rng):
        env = VecEnv(make_task("PointMass"), num_envs=4)
        state, obs = env.reset(rng)
        _, _, _, _, info = env.step(state, jnp.zeros((4, 2)), rng)
        assert "success" in info and info["success"].shape == (4,)


class TestWrappers:
    def test_flat_ob_task(self, rng):
        """FlatObTask flattens dict observations (reference
        pql/wrappers/flatten_ob.py semantics)."""
        import jax.numpy as jnp
        from pql_tpu.envs import VecEnv, make_task
        from pql_tpu.envs.wrappers import FlatObTask

        base = make_task("PointMass")

        class DictTask:
            action_dim = base.action_dim
            max_episode_length = base.max_episode_length

            def init_state(self, rng):
                return base.init_state(rng)

            def get_obs(self, state):
                flat = base.get_obs(state)
                return {"a": flat[:2], "b": flat[2:]}

            def dynamics(self, state, action, rng):
                return base.dynamics(state, action, rng)

        task = FlatObTask(DictTask())
        assert task.obs_dim == base.obs_dim
        env = VecEnv(task, 4)
        s, obs = env.reset(rng)
        assert obs.shape == (4, base.obs_dim)
        s, obs2, r, d, info = env.step(s, jnp.zeros((4, task.action_dim)), rng)
        assert obs2.shape == (4, base.obs_dim)

    def test_clip_action_task(self, rng):
        import jax.numpy as jnp
        import numpy as np
        from pql_tpu.envs import make_task
        from pql_tpu.envs.wrappers import ClipActionTask

        task = ClipActionTask(make_task("Pendulum"))
        s = task.init_state(rng)
        ns1, r1, *_ = task.dynamics(s, jnp.array([10.0]), rng)
        ns2, r2, *_ = task.dynamics(s, jnp.array([1.0]), rng)
        np.testing.assert_allclose(r1, r2)
