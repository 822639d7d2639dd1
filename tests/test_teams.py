"""Split-population team agents: IART, IPPOTeam, IPPOTeam2 mechanics
(reference pql/algo/iart.py, ppoteam.py, ppoteam2.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import pytest
pytestmark = pytest.mark.slow  # compile-heavy: EQ/team/vision/diffusion agents (see pytest.ini)

from pql_tpu.cfg import make_config
from pql_tpu.envs import make_env


def ma_cfg(algo, **kw):
    base = dict(
        task="BimanualReacher",
        num_envs=16,
        algo__batch_size=32,
        algo__horizon_len=8,
        algo__update_times=2,
        eval_num_envs=8,
        logging__mode="off",
    )
    base.update(kw)
    return make_config(algo, **base)


def run_iters(agent, state, n=2):
    for _ in range(n):
        state, metrics = agent.train_iter(state)
    jax.block_until_ready(metrics)
    return state, metrics


class TestIART:
    def test_smoke(self, rng):
        from pql_tpu.algos.teams import IART

        cfg = ma_cfg("iart")
        agent = IART(cfg, make_env(cfg))
        state = agent.init(rng)
        assert set(state.params) == {
            "actor", "actor_left", "critic", "critic_left",
            "actor_team", "actor_left_team", "critic_team", "critic_left_team",
        }
        state, metrics = run_iters(agent, state)
        for k in ("train/actor_loss", "train/actor_loss_team",
                  "train/actor_loss_left_team", "train/critic_loss_team"):
            assert np.isfinite(float(metrics[k])), k

    def test_odd_envs_rejected(self):
        from pql_tpu.algos.teams import IART

        cfg = ma_cfg("iart", num_envs=15)
        with pytest.raises(ValueError):
            IART(cfg, make_env(cfg))


class TestIPPOTeam:
    @pytest.mark.parametrize("algo", ["ippoteam", "ippoteam2"])
    def test_smoke(self, rng, algo):
        from pql_tpu.algos import get_algo

        cfg = ma_cfg(algo)
        agent = get_algo(cfg.algo.name)(cfg, make_env(cfg))
        state = agent.init(rng)
        assert "critic_tot" in state.params and "actor_team" in state.params
        state, metrics = run_iters(agent, state)
        for k in ("train/actor_loss", "train/actor_loss_team",
                  "train/critic_loss_tot", "train/critic_loss_team"):
            assert np.isfinite(float(metrics[k])), (algo, k)

    def test_eval_uses_team_policy(self, rng):
        from pql_tpu.algos.teams import IPPOTeam

        cfg = ma_cfg("ippoteam")
        agent = IPPOTeam(cfg, make_env(cfg))
        state = agent.init(rng)
        act = agent.eval_actor_apply(state.params, jnp.zeros((3, 24)))
        assert act.shape == (3, 4)

    def test_team2_half_streams(self, rng):
        """Team2's hand streams use only the individual half of the envs."""
        from pql_tpu.algos.teams import IPPOTeam2

        cfg = ma_cfg("ippoteam2")
        agent = IPPOTeam2(cfg, make_env(cfg))
        assert agent.ind_streams_full is False
        state = agent.init(rng)
        state, metrics = run_iters(agent, state, n=1)
        assert np.isfinite(float(metrics["train/actor_loss"]))
