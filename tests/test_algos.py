"""Algorithm mechanics tests (fast — no long training runs).

Covers: PQL fused step on the 8-device CPU mesh (counters, ratios,
determinism, replay plumbing), DDPG/SAC/CrossQ update mechanics, PPO GAE
golden values vs a naive python loop implementing the reference semantics
(pql/algo/ppo.py:75-116).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pql_tpu.cfg import make_config


def tiny_cfg(algo, **kw):
    base = dict(
        task="PointMass",
        num_envs=16,
        algo__batch_size=64,
        algo__memory_size=4096,
        algo__warm_up=4,
        algo__horizon_len=1,
        eval_num_envs=8,
        logging__mode="off",
    )
    base.update(kw)
    return make_config(algo, **base)


class TestPQLFused:
    @pytest.fixture(scope="class")
    def agent_factory(self):
        from pql_tpu.algos.pql import PQL
        from pql_tpu.parallel import make_mesh

        cfg = tiny_cfg("pql")
        agent = PQL(cfg, mesh=make_mesh(8))
        return agent

    @pytest.fixture
    def agent_state(self, agent_factory):
        # fresh state per test: train_iter/warmup donate their input buffers
        return agent_factory, agent_factory.init(jax.random.PRNGKey(0))

    def test_warmup_fills_replay(self, agent_state):
        agent, state = agent_state
        state, _ = agent.warmup(state)
        assert int(state.replay.total_writes) == agent.cfg.algo.warm_up
        # per-env counter (int32 overflow protection, see PQLState.env_steps)
        assert int(state.env_steps) == agent.cfg.algo.warm_up
        assert int(state.critic_update_count) == 0

    def test_update_ratios_exact(self, agent_state):
        """The async rate controller's targets become exact integers:
        critic:sim = 8, critic:actor = 2 (pql_algo.yaml:17-18)."""
        agent, state = agent_state
        state, _ = agent.warmup(state)
        for _ in range(3):
            state, metrics = agent.train_iter(state)
        assert int(state.critic_update_count) == 3 * 8
        assert int(state.actor_update_count) == 3 * 4
        for v in metrics.values():
            assert bool(jnp.isfinite(v))

    def test_set_ratios_rejits_and_training_continues(self):
        """Host-side ratio adaptation (the reference controller's analog,
        train_pql.py:127-158): set_ratios re-jits the step; the state is a
        jit input so params/replay/counters carry straight over."""
        from pql_tpu.algos.pql import PQL

        agent = PQL(tiny_cfg("pql"))
        state = agent.init(jax.random.PRNGKey(0))
        state, _ = agent.warmup(state)
        for _ in range(2):
            state, _ = agent.train_iter(state)
        params_mid = np.asarray(state.actor_params).copy()
        agent.set_ratios(4, 2)
        for _ in range(2):
            state, metrics = agent.train_iter(state)
        assert int(state.critic_update_count) == 2 * 8 + 2 * 4
        assert int(state.actor_update_count) == 2 * 4 + 2 * 2
        # training really continued: params moved and stayed finite
        assert not np.array_equal(np.asarray(state.actor_params), params_mid)
        for v in metrics.values():
            assert bool(jnp.isfinite(v))

    def test_precompiled_ratio_ladder_swaps_without_rejit(self):
        """precompile_ratio_ladder AOT-compiles the escalation rungs; a
        later set_ratios to a prepared rung swaps in the compiled
        executable (no retrace — the mid-flagship-run stall fix) and
        training continues with exact counters."""
        from pql_tpu.algos.pql import PQL

        agent = PQL(
            tiny_cfg("pql", algo__critic_sample_ratio=2, algo__iters_per_call=1)
        )
        state = agent.init(jax.random.PRNGKey(0))
        state, _ = agent.warmup(state)
        rungs = agent.precompile_ratio_ladder(state, factor=2, max_ratio=8)
        assert rungs == [4, 8]
        # original ratios restored after precompilation
        assert agent.n_critic == 2
        state, _ = agent.train_iter(state)
        agent.set_ratios(4, agent.cfg.algo.critic_actor_ratio)
        # the prepared executable is in place (an AOT Compiled, not a jit)
        assert agent.train_block is agent._ladder[(agent.n_critic, agent.n_actor)]
        state, metrics = agent.train_block(state)
        assert int(state.critic_update_count) == 2 + 4
        for v in metrics.values():
            assert bool(jnp.isfinite(v))

    def test_deterministic_given_seed(self, agent_state):
        agent, _ = agent_state

        def run():
            s = agent.init(jax.random.PRNGKey(7))
            s, _ = agent.warmup(s)
            s, m = agent.train_iter(s)
            return s

        s1, s2 = run(), run()
        a1 = jax.tree_util.tree_leaves(s1.actor_params)
        a2 = jax.tree_util.tree_leaves(s2.actor_params)
        for x, y in zip(a1, a2):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_params_replicated_across_shards(self, agent_state):
        """After sharded updates every device must hold identical params
        (grads are pmean'd)."""
        agent, state = agent_state
        state, _ = agent.warmup(state)
        state, _ = agent.train_iter(state)
        leaf = jax.tree_util.tree_leaves(state.actor_params)[0]
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)

    def test_mixed_noise_spreads_across_global_env_axis(self, agent_state):
        """Shard 0 envs get std≈0.05 noise, last shard ≈0.8: actions of the
        last envs should be visibly noisier after one policy rollout."""
        agent, state = agent_state
        state, _ = agent.warmup(state)
        for _ in range(3):
            state, _ = agent.train_iter(state)
        # replay now contains policy actions; actions from high-index envs
        # should have higher dispersion around tanh outputs
        acts = np.asarray(state.replay.field("action")[4:7])  # post-warmup slots
        lo = acts[:, :4].std()
        hi = acts[:, -4:].std()
        assert hi > lo

    def test_distl_variant_runs(self):
        from pql_tpu.algos.pql import PQL
        from pql_tpu.parallel import make_mesh

        cfg = tiny_cfg("pql_d")
        agent = PQL(cfg, mesh=make_mesh(4))
        state = agent.init(jax.random.PRNGKey(0))
        state, _ = agent.warmup(state)
        state, metrics = agent.train_iter(state)
        assert bool(jnp.isfinite(metrics["train/critic_loss"]))
        assert float(metrics["train/critic_loss"]) > 0  # BCE is positive


class TestOffPolicyAgents:
    def _run_two_iters(self, algo_name):
        from pql_tpu.algos import get_algo
        from pql_tpu.envs import make_env

        cfg = tiny_cfg(algo_name, algo__update_times=2)
        env = make_env(cfg)
        agent = get_algo(cfg.algo.name)(cfg, env)
        state = agent.init(jax.random.PRNGKey(0))
        state, _ = agent.warmup(state)
        p_before = jax.tree_util.tree_leaves(state.actor_params)[0]
        state, metrics = agent.train_iter(state)
        p_after = jax.tree_util.tree_leaves(state.actor_params)[0]
        assert not np.array_equal(np.asarray(p_before), np.asarray(p_after))
        for v in metrics.values():
            assert bool(jnp.isfinite(v))
        return state

    def test_ddpg(self):
        state = self._run_two_iters("ddpg")
        assert int(state.update_count) == 2

    def test_sac_alpha_moves(self):
        from pql_tpu.algos import get_algo
        from pql_tpu.envs import make_env

        cfg = tiny_cfg("sac", algo__update_times=2)
        env = make_env(cfg)
        agent = get_algo("SAC")(cfg, env)
        state = agent.init(jax.random.PRNGKey(0))
        state, _ = agent.warmup(state)
        state, _ = agent.train_iter(state)
        assert float(state.log_alpha[0]) != 0.0

    def test_crossq(self):
        from pql_tpu.algos import get_algo
        from pql_tpu.envs import make_env

        cfg = tiny_cfg("crossq", algo__update_times=2)
        env = make_env(cfg)
        agent = get_algo("CrossQ")(cfg, env)
        state = agent.init(jax.random.PRNGKey(0))
        state, _ = agent.warmup(state)
        bs_before = jax.tree_util.tree_leaves(state.batch_stats)[0]
        state, metrics = agent.train_iter(state)
        bs_after = jax.tree_util.tree_leaves(state.batch_stats)[0]
        # BN running stats must move (train-mode forward)
        assert not np.array_equal(np.asarray(bs_before), np.asarray(bs_after))
        assert bool(jnp.isfinite(metrics["train/critic_loss"]))


class TestNoiseDecay:
    """noise.decay wiring (reference pql_actor.py:44-54 builds schedulers
    but never steps them; ours evaluates them at the iteration index)."""

    def _dispersion(self, decay, step, **noise_kw):
        from pql_tpu.algos import base as algo_base
        from pql_tpu.envs import make_env

        cfg = tiny_cfg("ddpg", algo__noise__decay=decay)
        for k, v in noise_kw.items():
            setattr(cfg.algo.noise, k, v)
        env = make_env(cfg)
        actor = algo_base.build_actor(cfg, env)
        params = actor.init(jax.random.PRNGKey(0), jnp.zeros((1, env.obs_dim)))
        action_fn = algo_base.exploration_policy(cfg, actor)
        obs = jnp.zeros((cfg.num_envs, env.obs_dim))
        det = actor.apply(params, obs)
        noisy = action_fn(
            params, obs, jax.random.PRNGKey(1), random=False,
            num_envs_global=cfg.num_envs, step=step,
        )
        return float(jnp.abs(noisy - det).mean())

    def test_linear_decay_shrinks_action_dispersion(self):
        d0 = self._dispersion("linear", 0, lin_decay_iters=100)
        d_end = self._dispersion("linear", 100, lin_decay_iters=100)
        assert d_end < 0.5 * d0
        # fully decayed: band collapses to std_min on both ends
        d_half = self._dispersion("linear", 50, lin_decay_iters=100)
        assert d_end < d_half < d0

    def test_exp_decay_shrinks_and_floors_at_std_min(self):
        d0 = self._dispersion("exp", 0, exp_decay_rate=0.9)
        d_late = self._dispersion("exp", 500, exp_decay_rate=0.9)
        assert d_late < 0.5 * d0
        d_later = self._dispersion("exp", 5000, exp_decay_rate=0.9)
        # floored at std_min, not zero
        assert d_later > 0.0
        assert abs(d_later - d_late) < 0.05

    def test_no_decay_is_static(self):
        assert self._dispersion(None, 0) == self._dispersion(None, 10_000)

    def test_pql_sim_phase_honors_decay(self):
        """End-to-end: a PQL agent with aggressive linear decay should log
        replay actions whose *noise residual* (action − deterministic
        policy action) shrinks across iterations. Learning is frozen
        (lr=0, obs_norm off) so the deterministic policy is a fixed
        function of the stored obs."""
        from pql_tpu.algos.pql import PQL
        from pql_tpu.parallel import make_mesh

        cfg = tiny_cfg(
            "pql",
            algo__noise__decay="linear",
            algo__noise__lin_decay_iters=4,
            algo__warm_up=4,
            algo__actor_lr=0.0,
            algo__critic_lr=0.0,
            algo__obs_norm=False,
        )
        agent = PQL(cfg, mesh=make_mesh(4))
        state = agent.init(jax.random.PRNGKey(0))
        state, _ = agent.warmup(state)
        for _ in range(8):  # run past lin_decay_iters
            state, _ = agent.train_iter(state)
        acts = np.asarray(state.replay.field("action"))
        obs = np.asarray(state.replay.field("obs"))
        det = np.asarray(
            agent.actor.apply(agent._unravel_a(state.actor_params), obs.reshape(-1, obs.shape[-1]))
        ).reshape(acts.shape)
        resid = acts - det
        early = resid[4]   # first post-warmup policy slot (iter 0, full band)
        late = resid[11]   # fully decayed slot
        assert np.abs(late).mean() < 0.5 * np.abs(early).mean()


def _naive_gae(rewards, values, dones, truncated, next_value, next_done, gamma, lam):
    """Python transcription of the reference GAE loop (ppo.py:88-107):
    dones[t] is the done flag that produced obs[t]."""
    T = rewards.shape[0]
    adv = np.zeros_like(rewards)
    lastgaelam = 0.0
    for t in reversed(range(T)):
        if t == T - 1:
            nnt = 1.0 - next_done
            nv = next_value
        else:
            nnt = 1.0 - dones[t + 1]
            nv = values[t + 1]
        nnt2 = np.logical_xor(nnt > 0.5, truncated[t] > 0.5).astype(np.float32)
        delta = rewards[t] + gamma * nv * nnt2 - values[t]
        lastgaelam = delta + gamma * lam * nnt * lastgaelam
        adv[t] = lastgaelam
    return adv


class TestPPO:
    def test_gae_matches_naive_reference(self):
        from pql_tpu.algos.ppo import PPO
        from pql_tpu.envs import make_env

        cfg = tiny_cfg("ppo", algo__horizon_len=8, algo__batch_size=128, algo__obs_norm=False)
        env = make_env(cfg)
        agent = PPO(cfg, env)
        state = agent.init(jax.random.PRNGKey(0))

        T, E = 8, 16
        rs = np.random.RandomState(3)
        traj = {
            "obs": jnp.asarray(rs.randn(T, E, env.obs_dim), jnp.float32),
            "dones": jnp.asarray((rs.rand(T, E) < 0.2).astype(np.float32)),
            "action": jnp.asarray(rs.randn(T, E, env.action_dim), jnp.float32),
            "logp": jnp.asarray(rs.randn(T, E), jnp.float32),
            "reward": jnp.asarray(rs.randn(T, E), jnp.float32),
            "value": jnp.asarray(rs.randn(T, E), jnp.float32),
            "truncated": jnp.asarray((rs.rand(T, E) < 0.1).astype(np.float32)),
        }
        final_dones = (rs.rand(E) < 0.2).astype(np.float32)
        state = state.replace(dones=jnp.asarray(final_dones))
        state2, (b_obs, b_act, b_logp, b_adv, b_ret, b_val) = agent._compute_adv(state, traj)

        obs_n = np.asarray(state.obs)
        next_value = np.asarray(agent.critic.apply(state.critic_params, state.obs)[..., 0])
        adv_ref = _naive_gae(
            np.asarray(traj["reward"]),
            np.asarray(traj["value"]),
            np.asarray(traj["dones"]),
            np.asarray(traj["truncated"]),
            next_value,
            final_dones,
            cfg.algo.gamma,
            cfg.algo.lambda_gae_adv,
        )
        np.testing.assert_allclose(
            np.asarray(b_adv).reshape(T, E), adv_ref, rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(b_ret).reshape(T, E),
            adv_ref + np.asarray(traj["value"]),
            rtol=1e-4,
            atol=1e-5,
        )

    def test_train_iter_runs(self):
        from pql_tpu.algos.ppo import PPO
        from pql_tpu.envs import make_env

        cfg = tiny_cfg("ppo", algo__horizon_len=4, algo__batch_size=32, algo__update_times=2)
        env = make_env(cfg)
        agent = PPO(cfg, env)
        state = agent.init(jax.random.PRNGKey(0))
        state, metrics = agent.train_iter(state)
        assert int(state.update_count) == 2 * (4 * 16 // 32)
        for v in metrics.values():
            assert bool(jnp.isfinite(v))

    def test_batch_divisibility_enforced(self):
        from pql_tpu.algos.ppo import PPO
        from pql_tpu.envs import make_env

        cfg = tiny_cfg("ppo", algo__horizon_len=3, algo__batch_size=32)
        with pytest.raises(ValueError):
            PPO(cfg, make_env(cfg))


class TestEvaluator:
    def test_eval_rollout(self):
        from pql_tpu.algos.ddpg import DDPG
        from pql_tpu.envs import make_env, make_eval_env
        from pql_tpu.utils.evaluator import Evaluator

        cfg = tiny_cfg("ddpg")
        env = make_env(cfg)
        agent = DDPG(cfg, env)
        state = agent.init(jax.random.PRNGKey(0))
        ev = Evaluator(cfg, make_eval_env(cfg), agent.eval_actor_apply)
        metrics = ev.eval_policy(state.actor_params, state.obs_rms, jax.random.PRNGKey(1))
        assert "eval/return" in metrics and np.isfinite(metrics["eval/return"])
        assert metrics["eval/episode_length"] > 0


class TestPrefetchBatches:
    def test_bitwise_identical_to_per_update_gathers(self):
        """algo.prefetch_batches hoists the learner-phase replay gathers in
        front of the update scans; the ring is static through those phases
        and the key derivation is unchanged, so training must be BITWISE
        identical with the flag on or off."""
        from pql_tpu.algos.pql import PQL
        from pql_tpu.parallel import make_mesh

        def run(prefetch):
            cfg = tiny_cfg("pql", algo__prefetch_batches=prefetch)
            agent = PQL(cfg, mesh=make_mesh(2))
            s = agent.init(jax.random.PRNGKey(7))
            s, _ = agent.warmup(s)
            for _ in range(3):
                s, _ = agent.train_iter(s)
            return np.asarray(s.critic_params), np.asarray(s.actor_params)

        c0, a0 = run(False)
        c1, a1 = run(True)
        np.testing.assert_array_equal(c0, c1)
        np.testing.assert_array_equal(a0, a1)


class TestStepCounterOverflowSafety:
    """PQL's device counter stores PER-ENV steps so int32 can never wrap
    (the r5 'calm' probe logged step -1.54e9 past 2.15B total steps when
    the counter stored totals)."""

    def test_per_env_counter_stays_small(self):
        import jax

        from pql_tpu.algos.pql import PQL
        from pql_tpu.cfg import make_config

        cfg = make_config(
            "pql", task="PointMass", num_envs=64, algo__batch_size=128,
            algo__memory_size=4096, algo__warm_up=2, logging__mode="off",
        )
        agent = PQL(cfg)
        state = agent.init(jax.random.PRNGKey(0))
        state, _ = agent.warmup(state)
        for _ in range(3):
            state, _ = agent.train_iter(state)
        # warm_up(2) + 3 iterations x horizon(1) = 5 per env — NOT x num_envs
        assert int(state.env_steps) == 2 + 3
        # the total a 2.15B-step run implies stays far under int32 as a
        # per-env count: 2.15e9 / 8192 envs = ~262k
        assert (2_150_000_000 // 8192) < 2**31
