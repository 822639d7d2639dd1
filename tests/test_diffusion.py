"""Diffusion tier tests: DDPM schedule math vs diffusers semantics,
policy sample/loss shapes, equivariance of the equivariant diffusion
policy, pointnet encoders, and EQSD/EQSD2/QTOT agent mechanics."""

import jax
import jax.numpy as jnp
import numpy as np

import pytest
pytestmark = pytest.mark.slow  # compile-heavy: EQ/team/vision/diffusion agents (see pytest.ini)

from pql_tpu.cfg import make_config
from pql_tpu.envs import make_env
from pql_tpu.ops.ddpm import ddpm_add_noise, ddpm_sample, ddpm_step, make_ddpm_schedule


def ma_cfg(algo, **kw):
    base = dict(
        task="BimanualReacher",
        num_envs=16,
        algo__batch_size=64,
        algo__horizon_len=8,
        algo__update_times=2,
        algo__diffusion_iter=3,
        eval_num_envs=8,
        logging__mode="off",
    )
    base.update(kw)
    return make_config(algo, **base)


class TestDDPMSchedule:
    def test_squaredcos_schedule_values(self):
        """Betas match diffusers' betas_for_alpha_bar('squaredcos_cap_v2')."""
        import math

        sched = make_ddpm_schedule(10)

        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        expected = [
            min(1 - alpha_bar((i + 1) / 10) / alpha_bar(i / 10), 0.999)
            for i in range(10)
        ]
        np.testing.assert_allclose(sched.betas, expected, rtol=1e-5)
        np.testing.assert_allclose(
            sched.alphas_cumprod, np.cumprod(1.0 - np.asarray(expected)), rtol=1e-3
        )

    def test_add_noise(self):
        sched = make_ddpm_schedule(10)
        x0 = jnp.ones((4, 3))
        noise = 2.0 * jnp.ones((4, 3))
        t = jnp.array([0, 3, 5, 9])
        out = ddpm_add_noise(sched, x0, noise, t)
        a = np.asarray(sched.alphas_cumprod)[np.asarray(t)]
        expected = np.broadcast_to(
            (np.sqrt(a) * 1.0 + np.sqrt(1 - a) * 2.0)[:, None], (4, 3)
        )
        np.testing.assert_allclose(out, expected, rtol=1e-5)

    def test_step_t0_is_deterministic_x0(self, rng):
        """At t=0 the step returns the (clipped) x0 prediction exactly."""
        sched = make_ddpm_schedule(10)
        x_t = jnp.array([[0.5, -0.3]])
        eps = jnp.array([[0.1, 0.2]])
        out = ddpm_step(sched, eps, jnp.asarray(0), x_t, rng)
        a0 = float(sched.alphas_cumprod[0])
        x0 = np.clip((np.asarray(x_t) - np.sqrt(1 - a0) * np.asarray(eps)) / np.sqrt(a0), -1, 1)
        np.testing.assert_allclose(out, x0, rtol=1e-4)

    def test_sample_in_clip_range(self, rng):
        sched = make_ddpm_schedule(5)
        out = ddpm_sample(sched, lambda x, t: jnp.zeros_like(x), (8, 4), rng)
        assert out.shape == (8, 4)
        # after the final (t=0, clipped-x0) step the output is bounded
        assert float(jnp.max(jnp.abs(out))) <= 1.0 + 1e-5


class TestDiffusionPolicies:
    def test_state_policy_shapes_and_loss(self, rng):
        from pql_tpu.models.diffusion import StateDiffusionPolicy

        pol = StateDiffusionPolicy(action_dim=3, diffusion_iter=4)
        obs = jnp.zeros((6, 10))
        params = pol.init(rng, obs, rng)
        act = pol.apply(params, obs, jax.random.PRNGKey(1))
        assert act.shape == (6, 3)
        loss = pol.apply(
            params, obs, jnp.zeros((6, 3)), jax.random.PRNGKey(2),
            method=StateDiffusionPolicy.get_loss,
        )
        assert np.isfinite(float(loss))

    def test_vision_policy(self, rng):
        from pql_tpu.models.diffusion import DiffusionPolicy

        pol = DiffusionPolicy(action_dim=2, diffusion_iter=3)
        state = jnp.zeros((4, 8))
        pc = jnp.zeros((4, 32, 3))
        params = pol.init(rng, state, pc, rng)
        act = pol.apply(params, state, pc, jax.random.PRNGKey(1))
        assert act.shape == (4, 2)
        loss = pol.apply(
            params, state, pc, jnp.zeros((4, 2)), jax.random.PRNGKey(2),
            method=DiffusionPolicy.get_loss,
        )
        assert np.isfinite(float(loss))

    def test_equivariant_diffusion_is_equivariant(self, rng):
        """g-transformed conditioning + g-transformed noise path ⇒ the
        ε-net output transforms by g_act (checked on the net directly,
        which implies distributional equivariance of the sampler)."""
        from pql_tpu.models.ediffusion import EquivariantDiffusionNet
        from pql_tpu.models.emlp import sign_rep

        gen_obs = sign_rep((1.0, -1.0, 1.0, -1.0))
        gen_act = sign_rep((-1.0, 1.0))
        net = EquivariantDiffusionNet(gen_obs, gen_act, hidden_units=32)
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 2))
        t = jnp.ones(5) * 2.0
        cond = jax.random.normal(jax.random.PRNGKey(2), (5, 4))
        params = net.init(rng, x, t, cond)
        g_o = jnp.asarray(np.asarray(gen_obs, np.float32))
        g_a = jnp.asarray(np.asarray(gen_act, np.float32))
        out1 = net.apply(params, x @ g_a, t, cond @ g_o)
        out2 = net.apply(params, x, t, cond) @ g_a
        np.testing.assert_allclose(out1, out2, atol=1e-5)

    def test_pointnet_permutation_invariant(self, rng):
        from pql_tpu.models.pointnet import MultiStagePointNetEncoder

        enc = MultiStagePointNetEncoder(h_dim=16, out_channels=8, num_layers=2)
        pc = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 3))
        params = enc.init(rng, pc)
        out1 = enc.apply(params, pc)
        perm = jax.random.permutation(jax.random.PRNGKey(2), 16)
        out2 = enc.apply(params, pc[:, perm])
        np.testing.assert_allclose(out1, out2, atol=1e-5)


def run_iters(agent, state, n=2):
    for _ in range(n):
        state, metrics = agent.train_iter(state)
    jax.block_until_ready(metrics)
    return state, metrics


class TestTeamAgents:
    def test_eqsd_gaussian_team(self, rng):
        from pql_tpu.algos.eqsd import EQSD

        cfg = ma_cfg("eqsd")
        agent = EQSD(cfg, make_env(cfg))
        state = agent.init(rng)
        assert "actor_team" in state.params
        state, metrics = run_iters(agent, state)
        assert np.isfinite(float(metrics["train/actor_loss_team"]))

    def test_eqsd_diffusion_team(self, rng):
        from pql_tpu.algos.eqsd import EQSD

        cfg = ma_cfg("eqsd", algo__diffusion=True)
        agent = EQSD(cfg, make_env(cfg))
        state = agent.init(rng)
        state, metrics = run_iters(agent, state, n=1)
        assert np.isfinite(float(metrics["train/actor_loss_team"]))

    def test_eqsd2(self, rng):
        from pql_tpu.algos.eqsd import EQSD2

        cfg = ma_cfg("eqsd2")
        agent = EQSD2(cfg, make_env(cfg))
        state = agent.init(rng)
        state, metrics = run_iters(agent, state)
        assert np.isfinite(float(metrics["train/actor_loss"]))
        assert np.isfinite(float(metrics["train/actor_loss_left"]))
        assert np.isfinite(float(metrics["train/actor_loss_team"]))
        assert np.isfinite(float(metrics["train/critic_loss_team"]))
        # eval hook drives the team policy
        act = agent.eval_actor_apply(state.params, jnp.zeros((3, 24)))
        assert act.shape == (3, 4)

    @pytest.mark.parametrize("algo", ["qtotv1", "qtotv2"])
    def test_qtot(self, rng, algo):
        from pql_tpu.algos import get_algo

        cfg = ma_cfg(algo)
        agent = get_algo(cfg.algo.name)(cfg, make_env(cfg))
        state = agent.init(rng)
        assert "critic_tot" in state.params
        state, metrics = run_iters(agent, state)
        assert np.isfinite(float(metrics["train/critic_loss_tot"])), algo
        assert np.isfinite(float(metrics["train/actor_loss"])), algo
