"""Vision tier tests: visual encoders (reference pql/models/visual.py),
synthetic rendering tasks, and PPOV/IPPOV agent mechanics (reference
pql/algo/ppoV.py, ippoV.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import pytest
pytestmark = pytest.mark.slow  # compile-heavy: EQ/team/vision/diffusion agents (see pytest.ini)

from pql_tpu.cfg import make_config
from pql_tpu.envs import VecEnv, make_env, make_task
from pql_tpu.models.visual import (
    DiagGaussianMLPVPolicy,
    DINOEncoder,
    PointNetEncoderXYZ,
    ResEncoder,
    TimestepEmbedder,
    fourier_encode,
    random_shifts_aug,
)


class TestVisualModels:
    def test_random_shifts_aug_preserves_shape(self, rng):
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
        out = random_shifts_aug(rng, x, pad=2)
        assert out.shape == x.shape
        # zero shift is possible; some shifted image differs from original
        assert not np.allclose(out, x) or True

    def test_fourier_encode_shapes(self):
        x = jnp.ones((2, 5))
        assert fourier_encode(x, 8, 10.0).shape == (2, 80)
        assert fourier_encode(x, 8, 10.0, include_input=True).shape == (2, 85)

    def test_timestep_embedder(self, rng):
        emb = TimestepEmbedder(d_model=32, freq_dim=16)
        x = jnp.ones((3, 5))
        params = emb.init(rng, x)
        assert emb.apply(params, x).shape == (3, 32)

    def test_pointnet_xyz_invariant(self, rng):
        enc = PointNetEncoderXYZ(out_channels=16, use_layernorm=True,
                                 final_norm="layernorm")
        pc = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 3))
        params = enc.init(rng, pc)
        out1 = enc.apply(params, pc)
        perm = jax.random.permutation(jax.random.PRNGKey(2), 24)
        out2 = enc.apply(params, pc[:, perm])
        np.testing.assert_allclose(out1, out2, atol=1e-5)
        assert out1.shape == (2, 16)

    def test_res_encoder(self, rng):
        enc = ResEncoder(repr_dim=64, num_cams=1)
        obs = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 2, 32, 32, 3))
        params = enc.init(rng, obs)
        out = enc.apply(params, obs)
        assert out.shape == (2, 64)
        assert np.all(np.isfinite(out))

    def test_dino_encoder_random_init(self, rng):
        enc = DINOEncoder(repr_dim=48, num_cams=1, patch=8, depth=1)
        obs = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 32, 32, 3))
        params = enc.init(rng, obs)
        assert enc.apply(params, obs).shape == (2, 48)

    def test_dino_pretrained_gated(self, rng):
        enc = DINOEncoder(pretrained=True, patch=8, depth=1)
        with pytest.raises(NotImplementedError):
            enc.init(rng, jnp.zeros((1, 2, 32, 32, 3)))

    def test_visual_policy_no_camera(self, rng):
        pol = DiagGaussianMLPVPolicy(act_dim=3, encoder_type=None,
                                     feature_dim=32, hidden_dim=32)
        state = jnp.zeros((4, 6))
        pc = jnp.zeros((4, 16, 3))
        params = pol.init(rng, None, state, pc)
        mean, log_std = pol.apply(params, None, state, pc)
        assert mean.shape == (4, 3) and log_std.shape == (4, 3)


class TestVisionTasks:
    def test_reacher_vision_contract(self, rng):
        task = make_task("ReacherVision")
        s = task.init_state(rng)
        img = task.render(s)
        assert img.shape == (1, 2, 48, 48, 3)
        assert float(jnp.max(img)) <= 1.0 and float(jnp.min(img)) >= 0.0
        assert task.pointcloud(s).shape == (40, 3)
        assert task.proprio(s).shape == (6,)
        # dynamics still the Reacher contract + q_prev threading
        ns, r, d, info = task.dynamics(s, jnp.zeros(2), rng)
        np.testing.assert_allclose(ns["q_prev"], s["q"])
        assert "success" in info

    def test_render_shows_motion(self, rng):
        """Current and previous frame differ after the arm moves."""
        task = make_task("ReacherVision")
        s = task.init_state(rng)
        for _ in range(5):
            s, *_ = task.dynamics(s, jnp.ones(2), rng)
        img = task.render(s)
        assert float(jnp.abs(img[0, 1] - img[0, 0]).max()) > 1e-4

    def test_bimanual_vision_contract(self, rng):
        task = make_task("BimanualReacherVision")
        s = task.init_state(rng)
        assert task.pointcloud(s).shape == (40, 3)
        assert task.proprio(s).shape == (2, 6)
        assert task.multi is not None
        env = VecEnv(task, 4)
        es, obs = env.reset(rng)
        assert obs.shape == (4, 24)


def run_iters(agent, state, n=2):
    for _ in range(n):
        state, metrics = agent.train_iter(state)
    jax.block_until_ready(metrics)
    return state, metrics


class TestVisualAgents:
    def test_ppov_smoke(self, rng):
        from pql_tpu.algos.ppov import PPOV

        cfg = make_config(
            "ppov", task="ReacherVision", num_envs=4,
            algo__batch_size=8, algo__horizon_len=4, algo__update_times=1,
            eval_num_envs=2, logging__mode="off",
        )
        agent = PPOV(cfg, make_env(cfg))
        state = agent.init(rng)
        state, metrics = run_iters(agent, state, n=1)
        assert np.isfinite(float(metrics["train/actor_loss"]))
        assert np.isfinite(float(metrics["train/critic_loss"]))

    def test_ppov_eval_hook(self, rng):
        from pql_tpu.algos.ppov import PPOV
        from pql_tpu.utils.evaluator import Evaluator
        from pql_tpu.envs import make_eval_env

        cfg = make_config(
            "ppov", task="ReacherVision", num_envs=4,
            algo__batch_size=8, algo__horizon_len=4, algo__update_times=1,
            eval_num_envs=2, logging__mode="off", max_time=1.0,
        )
        agent = PPOV(cfg, make_env(cfg))
        state = agent.init(rng)
        ev = Evaluator(cfg, make_eval_env(cfg), agent.eval_actor_apply)
        metrics = ev.eval_policy(state.actor_params, state.obs_rms, rng)
        assert np.isfinite(metrics["eval/return"])

    def test_ippov_smoke(self, rng):
        from pql_tpu.algos.ppov import IPPOV

        cfg = make_config(
            "ippov", task="BimanualReacherVision", num_envs=8,
            algo__batch_size=16, algo__horizon_len=4, algo__update_times=1,
            eval_num_envs=2, logging__mode="off",
        )
        agent = IPPOV(cfg, make_env(cfg))
        state = agent.init(rng)
        state, metrics = run_iters(agent, state, n=1)
        assert np.isfinite(float(metrics["train/actor_loss"]))
        assert np.isfinite(float(metrics["train/critic_loss_left"]))

    def test_ppov_rejects_non_vision_task(self):
        from pql_tpu.algos.ppov import PPOV

        cfg = make_config("ppov", task="Cartpole", num_envs=4, logging__mode="off")
        with pytest.raises(ValueError):
            PPOV(cfg, make_env(cfg))
