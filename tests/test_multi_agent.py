"""Multi-agent tier tests: SymmetryManager routing, the BimanualReacher
two-agent contract, and IPPO/MAPPO/IDDPG mechanics (reference
pql/algo/ippo.py, mappo.py, iddpg.py + the external bidex SymmetryManager
API they consume)."""

import jax
import jax.numpy as jnp
import numpy as np

import pytest
pytestmark = pytest.mark.slow  # compile-heavy: EQ/team/vision/diffusion agents (see pytest.ini)

from pql_tpu.cfg import make_config
from pql_tpu.envs import VecEnv, make_task
from pql_tpu.utils.symmetry import (
    MultiAgentSpec,
    SymmetryManager,
    ranges_to_indices,
    slice_tensor,
)


def ma_cfg(algo, **kw):
    base = dict(
        task="BimanualReacher",
        num_envs=16,
        algo__batch_size=64,
        algo__horizon_len=8,
        algo__update_times=2,
        algo__memory_size=4096,
        algo__warm_up=4,
        eval_num_envs=8,
        logging__mode="off",
    )
    base.update(kw)
    return make_config(algo, **base)


# ---------------------------------------------------------------------------
# symmetry manager
# ---------------------------------------------------------------------------


class TestSymmetry:
    def test_ranges_to_indices(self):
        np.testing.assert_array_equal(
            ranges_to_indices([(0, 3), (5, 7)]), [0, 1, 2, 5, 6]
        )

    def test_slice_tensor(self):
        x = jnp.arange(12.0).reshape(2, 6)
        out = slice_tensor(x, [(1, 3), (5, 6)])
        np.testing.assert_allclose(out, [[1, 2, 5], [7, 8, 11]])

    def _spec(self):
        return MultiAgentSpec(
            single_agent_obs_idx=(((0, 2),), ((2, 4),)),
            single_agent_obs_dim=(2, 2),
            single_agent_action_dim=1,
            shared_obs_dim=4,
            right_reward_terms=("r_term",),
            left_reward_terms=("l_term",),
            shared_reward_terms=("shared",),
            mirror_obs_perm=(1, 0),
            mirror_obs_sign=(1.0, -1.0),
            mirror_act_perm=(0,),
            mirror_act_sign=(-1.0,),
        )

    def test_split_and_merge_identity_tracker(self):
        m = SymmetryManager(self._spec(), symmetric_envs=False)
        obs = jnp.arange(8.0).reshape(2, 4)
        ob_r, ob_l = m.get_multi_agent_obs(obs, None)
        np.testing.assert_allclose(ob_r, [[0, 1], [4, 5]])
        np.testing.assert_allclose(ob_l, [[2, 3], [6, 7]])
        act = m.get_execute_action(jnp.ones((2, 1)), -jnp.ones((2, 1)), None)
        np.testing.assert_allclose(act, [[1, -1], [1, -1]])

    def test_mirrored_env_swaps_and_reflects(self):
        m = SymmetryManager(self._spec(), symmetric_envs=True)
        obs = jnp.array([[1.0, 2.0, 3.0, 4.0]])
        tracker = jnp.ones(1)
        ob_r, ob_l = m.get_multi_agent_obs(obs, tracker)
        # right view = mirror(left block [3,4]) = perm(1,0) then sign(1,-1)
        np.testing.assert_allclose(ob_r, [[4.0, -3.0]])
        np.testing.assert_allclose(ob_l, [[2.0, -1.0]])
        # action merge inverts the mirror: right slot <- unmirrored left act
        act = m.get_execute_action(jnp.array([[0.5]]), jnp.array([[0.25]]), tracker)
        np.testing.assert_allclose(act, [[-0.25, -0.5]])

    def test_reward_split(self):
        m = SymmetryManager(self._spec(), symmetric_envs=True)
        detailed = {
            "r_term": jnp.array([1.0, 10.0]),
            "l_term": jnp.array([2.0, 20.0]),
            "shared": jnp.array([0.5, 0.5]),
        }
        rew_r, rew_l = m.get_multi_agent_rew(detailed, jnp.array([0.0, 1.0]))
        # env 0 canonical, env 1 mirrored (roles swapped)
        np.testing.assert_allclose(rew_r, [1.5, 20.5])
        np.testing.assert_allclose(rew_l, [2.5, 10.5])


# ---------------------------------------------------------------------------
# bimanual task
# ---------------------------------------------------------------------------


class TestBimanualReacher:
    def test_contract(self, rng):
        env = VecEnv(make_task("BimanualReacher"), 4)
        s, obs = env.reset(rng)
        assert obs.shape == (4, 24)
        act = jnp.zeros((4, 4))
        s, obs2, rew, done, info = env.step(s, act, rng)
        assert set(info["detailed_reward"]) == {
            "reach_right", "reach_left", "ctrl_right", "ctrl_left", "coordination"
        }
        total = sum(info["detailed_reward"].values())
        np.testing.assert_allclose(rew, total, rtol=1e-5)
        assert "success" in info
        np.testing.assert_array_equal(env.symmetry_tracker(s), jnp.zeros(4))

    def test_role_swap_equivariance(self, rng):
        """Local-frame formulation ⇒ swapping the arms' states and actions
        swaps the per-arm obs blocks and the per-arm reward terms."""
        task = make_task("BimanualReacher")
        state = task.init_state(rng)
        swap = lambda x: x[::-1]
        state_sw = {
            "q": swap(state["q"]), "qd": swap(state["qd"]),
            "target": swap(state["target"]), "sym": state["sym"],
        }
        obs = task.get_obs(state).reshape(2, -1)
        obs_sw = task.get_obs(state_sw).reshape(2, -1)
        np.testing.assert_allclose(obs_sw, obs[::-1], atol=1e-6)

        act = jnp.array([0.3, -0.2, 0.8, 0.1])
        act_sw = jnp.concatenate([act[2:], act[:2]])
        ns, r, d, info = task.dynamics(state, act, rng)
        ns_sw, r_sw, d_sw, info_sw = task.dynamics(state_sw, act_sw, rng)
        np.testing.assert_allclose(r, r_sw, atol=1e-6)
        np.testing.assert_allclose(
            info["detailed_reward"]["reach_right"],
            info_sw["detailed_reward"]["reach_left"], atol=1e-6,
        )
        np.testing.assert_allclose(
            info["detailed_reward"]["coordination"],
            info_sw["detailed_reward"]["coordination"], atol=1e-6,
        )

    def test_symmetric_variant_tracker(self, rng):
        env = VecEnv(make_task("BimanualReacherSym"), 64)
        s, _ = env.reset(rng)
        tr = env.symmetry_tracker(s)
        assert tr.shape == (64,)
        # roughly half mirrored
        assert 10 < int(tr.sum()) < 54


# ---------------------------------------------------------------------------
# algorithms
# ---------------------------------------------------------------------------


def run_iters(agent, state, n=2):
    for _ in range(n):
        state, metrics = agent.train_iter(state)
    jax.block_until_ready(metrics)
    return state, metrics


class TestIPPO:
    def test_smoke(self, rng):
        from pql_tpu.algos.ippo import IPPO
        from pql_tpu.envs import make_env

        cfg = ma_cfg("ippo")
        agent = IPPO(cfg, make_env(cfg))
        state = agent.init(rng)
        state, metrics = run_iters(agent, state)
        for k in ("train/actor_loss", "train/critic_loss",
                  "train/actor_loss_left", "train/critic_loss_left"):
            assert np.isfinite(float(metrics[k])), k
        assert int(state.env_steps) == 2 * 8 * 16

    def test_same_policy_shares_params(self, rng):
        from pql_tpu.algos.ippo import IPPO
        from pql_tpu.envs import make_env

        cfg = ma_cfg("ippo", algo__same_policy=True)
        agent = IPPO(cfg, make_env(cfg))
        state = agent.init(rng)
        assert "actor_left" not in state.params
        state, metrics = run_iters(agent, state)
        assert np.isfinite(float(metrics["train/actor_loss"]))
        assert "train/actor_loss_left" not in metrics

    def test_eval_hook(self, rng):
        from pql_tpu.algos.ippo import IPPO
        from pql_tpu.envs import make_env

        cfg = ma_cfg("ippo")
        agent = IPPO(cfg, make_env(cfg))
        state = agent.init(rng)
        obs = jnp.zeros((5, 24))
        act = agent.eval_actor_apply(state.params, obs)
        assert act.shape == (5, 4)


class TestMAPPO:
    def test_smoke(self, rng):
        from pql_tpu.algos.mappo import MAPPO
        from pql_tpu.envs import make_env

        cfg = ma_cfg("mappo")
        agent = MAPPO(cfg, make_env(cfg))
        state = agent.init(rng)
        state, metrics = run_iters(agent, state)
        assert np.isfinite(float(metrics["train/actor_loss"]))
        assert np.isfinite(float(metrics["train/critic_loss"]))

    def test_centralized_critic_input_dim(self, rng):
        from pql_tpu.algos.mappo import MAPPO
        from pql_tpu.envs import make_env

        cfg = ma_cfg("mappo")
        agent = MAPPO(cfg, make_env(cfg))
        state = agent.init(rng)
        # critic first-layer kernel consumes the joint (shared) obs
        kernel = jax.tree_util.tree_leaves(
            state.critic_params["params"]["MLPNet_0"]["TorchLinear_0"]["kernel"]
        )[0]
        assert kernel.shape[0] == 24


class TestIDDPG:
    def test_smoke(self, rng):
        from pql_tpu.algos.iddpg import IDDPG
        from pql_tpu.envs import make_env

        cfg = ma_cfg("iddpg", algo__horizon_len=1, algo__update_times=2)
        agent = IDDPG(cfg, make_env(cfg))
        state = agent.init(rng)
        state, _ = agent.warmup(state)
        state, metrics = run_iters(agent, state)
        for k in ("train/critic_loss", "train/actor_loss",
                  "train/critic_loss_left", "train/actor_loss_left"):
            assert np.isfinite(float(metrics[k])), k

    def test_replay_two_reward_channels(self, rng):
        from pql_tpu.algos.iddpg import IDDPG
        from pql_tpu.envs import make_env

        cfg = ma_cfg("iddpg", algo__horizon_len=1)
        agent = IDDPG(cfg, make_env(cfg))
        state = agent.init(rng)
        assert state.replay.field("reward").shape[-1] == 2
        state, _ = agent.warmup(state)
        # after warm-up, stored rewards are populated with distinct channels
        assert state.replay.total_writes > 0


class TestNStepMultiChannel:
    def test_two_channel_matches_two_single_runs(self, rng):
        from pql_tpu.replay.nstep import create_nstep, nstep_scan

        T, E = 6, 3
        k1, k2, k3 = jax.random.split(rng, 3)
        rew = jax.random.normal(k1, (T, E, 2))
        done = (jax.random.uniform(k2, (T, E, 1)) < 0.2).astype(jnp.float32)
        obs = jax.random.normal(k3, (T, E, 4))
        traj = dict(obs=obs, action=jnp.zeros((T, E, 2)), reward=rew,
                    next_obs=obs, done=done)

        st2 = create_nstep(E, 4, 2, nstep=3, gamma=0.9, reward_dim=2)
        _, out2, _ = nstep_scan(st2, traj)

        for c in range(2):
            stc = create_nstep(E, 4, 2, nstep=3, gamma=0.9)
            trajc = dict(traj, reward=rew[..., c : c + 1])
            _, outc, _ = nstep_scan(stc, trajc)
            np.testing.assert_allclose(out2["reward"][..., c], outc["reward"][..., 0],
                                       rtol=1e-6)
            np.testing.assert_allclose(out2["done"], outc["done"])
