"""Tracker and config tests."""

from collections import deque

import jax.numpy as jnp
import numpy as np
import pytest

from pql_tpu.cfg import Config, make_config, parse_cli
from pql_tpu.utils.trackers import EpisodeStats, Tracker


class TestTracker:
    def test_matches_deque_semantics(self):
        tr = Tracker.create(4)
        ref = deque(maxlen=4)
        rs = np.random.RandomState(0)
        for _ in range(10):
            vals = rs.randn(6).astype(np.float32)
            mask = rs.rand(6) < 0.4
            tr = tr.update(jnp.asarray(vals), jnp.asarray(mask))
            for v, m in zip(vals, mask):
                if m:
                    ref.append(v)
            if ref:
                assert float(tr.mean()) == pytest.approx(float(np.mean(ref)), rel=1e-5)

    def test_empty_mean_is_zero(self):
        tr = Tracker.create(8)
        assert float(tr.mean()) == 0.0

    def test_multi_insert_one_step(self):
        tr = Tracker.create(10)
        tr = tr.update(jnp.array([1.0, 2.0, 3.0, 4.0]), jnp.array([True, False, True, True]))
        assert int(tr.count) == 3
        assert float(tr.mean()) == pytest.approx((1 + 3 + 4) / 3)


class TestEpisodeStats:
    def test_return_accumulation_and_reset(self):
        st = EpisodeStats.create(num_envs=3, tracker_len=8)
        st = st.update(jnp.array([1.0, 2.0, 3.0]), jnp.array([0.0, 0.0, 0.0]), {})
        st = st.update(jnp.array([1.0, 2.0, 3.0]), jnp.array([0.0, 1.0, 0.0]), {})
        # env 1 finished with return 4, length 2
        assert float(st.return_tracker.mean()) == pytest.approx(4.0)
        assert float(st.step_tracker.mean()) == pytest.approx(2.0)
        assert float(st.current_returns[1]) == 0.0
        assert float(st.current_returns[0]) == 2.0


class TestConfig:
    def test_algo_group_selection(self):
        cfg = parse_cli(["algo=sac", "task=Pendulum"])
        assert cfg.algo.name == "SAC"
        assert cfg.algo.act_class == "TanhDiagGaussianMLPPolicy"
        assert cfg.task == "Pendulum"

    def test_dotted_overrides_and_coercion(self):
        cfg = parse_cli(["algo=pql", "algo.batch_size=1024", "algo.noise.std_max=0.5", "num_envs=16", "algo.distl=true"])
        assert cfg.algo.batch_size == 1024
        assert cfg.algo.noise.std_max == 0.5
        assert cfg.num_envs == 16
        assert cfg.algo.distl is True

    def test_task_preset_tables(self):
        cfg = parse_cli(["algo=pql", "task=Ant"])
        assert cfg.algo.reward_scale == 0.01  # common.py:159-170
        assert cfg.max_time == 3600
        cfg = parse_cli(["algo=pql", "task=AllegroHand"])
        assert cfg.max_time == 4800

    def test_user_reward_scale_respected(self):
        cfg = parse_cli(["algo=pql", "task=Ant", "algo.reward_scale=0.5"])
        assert cfg.algo.reward_scale == 0.5

    def test_make_config_kwargs(self):
        cfg = make_config("ddpg", num_envs=32, algo__batch_size=256)
        assert cfg.algo.name == "DDPG" and cfg.num_envs == 32 and cfg.algo.batch_size == 256

    def test_unknown_field_raises(self):
        with pytest.raises(AttributeError):
            parse_cli(["algo.not_a_field=3"])

    def test_defaults_match_reference_operating_point(self):
        """BASELINE.md operating points (pql_algo.yaml)."""
        cfg = Config()
        assert cfg.num_envs == 4096
        assert cfg.algo.batch_size == 8192
        assert cfg.algo.memory_size == 5_000_000
        assert cfg.algo.nstep == 3
        assert cfg.algo.tau == 0.05
        assert cfg.algo.critic_sample_ratio == 8
        assert cfg.algo.critic_actor_ratio == 2
        assert cfg.algo.noise.std_max == 0.8 and cfg.algo.noise.std_min == 0.05
        assert cfg.algo.num_atoms == 51
