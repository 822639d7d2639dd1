"""Model zoo tests: shapes, bounds, distribution math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pql_tpu.models import (
    DiagGaussianMLPPolicy,
    DistributionalDoubleQ,
    DoubleQ,
    DoubleQBatchNorm,
    MLPCritic,
    TanhDiagGaussianMLPPolicy,
    TanhMLPPolicy,
    get_model,
)
from pql_tpu.models import distributions as D


class TestMLPZoo:
    def test_registry(self):
        assert get_model("TanhMLPPolicy") is TanhMLPPolicy
        with pytest.raises(KeyError):
            get_model("NoSuchModel")

    def test_tanh_policy_bounds(self, rng):
        model = TanhMLPPolicy(act_dim=6)
        params = model.init(rng, jnp.zeros((2, 10)))
        out = model.apply(params, jax.random.normal(rng, (32, 10)) * 100)
        assert out.shape == (32, 6)
        assert float(jnp.max(jnp.abs(out))) <= 1.0

    def test_double_q(self, rng):
        model = DoubleQ()
        params = model.init(rng, jnp.zeros((2, 10)), jnp.zeros((2, 4)))
        obs, act = jax.random.normal(rng, (16, 10)), jax.random.normal(rng, (16, 4))
        q1, q2 = model.apply(params, obs, act)
        qmin = model.apply(params, obs, act, method=DoubleQ.q_min)
        assert q1.shape == (16, 1)
        np.testing.assert_allclose(np.asarray(qmin), np.minimum(np.asarray(q1), np.asarray(q2)))

    def test_distributional_double_q(self, rng):
        model = DistributionalDoubleQ(num_atoms=51)
        params = model.init(rng, jnp.zeros((2, 10)), jnp.zeros((2, 4)))
        p1, p2 = model.apply(params, jnp.ones((8, 10)), jnp.ones((8, 4)))
        assert p1.shape == (8, 51)
        np.testing.assert_allclose(np.asarray(p1.sum(-1)), 1.0, atol=1e-5)
        qmin = model.apply(params, jnp.ones((8, 10)), jnp.ones((8, 4)), method=DistributionalDoubleQ.q_min)
        assert qmin.shape == (8, 1)
        assert float(jnp.max(jnp.abs(qmin))) <= 10.0  # within support

    def test_batchnorm_critic_mutable(self, rng):
        model = DoubleQBatchNorm()
        variables = model.init(rng, jnp.zeros((4, 10)), jnp.zeros((4, 4)), train=True)
        assert "batch_stats" in variables
        (q1, q2), updates = model.apply(
            variables,
            jax.random.normal(rng, (16, 10)),
            jax.random.normal(rng, (16, 4)),
            train=True,
            mutable=["batch_stats"],
        )
        assert q1.shape == (16, 1)

    def test_critic(self, rng):
        model = MLPCritic()
        params = model.init(rng, jnp.zeros((2, 10)))
        assert model.apply(params, jnp.ones((8, 10))).shape == (8, 1)

    def test_torch_init_scale(self, rng):
        """Kernel entries are U(±1/sqrt(fan_in)) like torch.nn.Linear."""
        model = TanhMLPPolicy(act_dim=2)
        params = model.init(rng, jnp.zeros((1, 100)))
        k0 = params["params"]["MLPNet_0"]["TorchLinear_0"]["kernel"]
        bound = 1.0 / np.sqrt(100)
        assert float(jnp.max(jnp.abs(k0))) <= bound + 1e-6
        assert float(jnp.std(k0)) > bound / 3  # roughly uniform, not collapsed


class TestDistributions:
    def test_diag_gaussian_logprob_matches_scipy_form(self, rng):
        mean = jnp.array([[0.5, -1.0]])
        log_std = jnp.array([[0.1, -0.3]])
        x = jnp.array([[0.7, -1.2]])
        ours = float(D.diag_gaussian_logprob(x, mean, log_std)[0])
        std = np.exp(np.asarray(log_std))
        ref = np.sum(
            -0.5 * ((np.asarray(x) - np.asarray(mean)) / std) ** 2
            - np.log(std)
            - 0.5 * np.log(2 * np.pi)
        )
        assert ours == pytest.approx(float(ref), rel=1e-5)

    def test_entropy(self):
        log_std = jnp.zeros((1, 3))
        ent = float(D.diag_gaussian_entropy(log_std)[0])
        assert ent == pytest.approx(3 * 0.5 * (1 + np.log(2 * np.pi)), rel=1e-5)

    def test_squashed_sample_in_bounds_and_logprob_finite(self, rng):
        mu = jnp.zeros((256, 4))
        log_std = jnp.full((256, 4), 2.0)
        a, logp = D.squashed_gaussian_sample_logprob(rng, mu, log_std)
        # tanh saturates to exactly 1.0 in fp32 for large std; must never exceed
        assert float(jnp.max(jnp.abs(a))) <= 1.0
        assert bool(jnp.all(jnp.isfinite(logp)))
        assert logp.shape == (256, 1)

    def test_tanh_logdet_stable_at_extremes(self):
        u = jnp.array([-30.0, 0.0, 30.0])
        ld = D.tanh_log_det_jacobian(u)
        assert bool(jnp.all(jnp.isfinite(ld)))
        # at u=0, d tanh/du = 1 → log det 0
        assert float(ld[1]) == pytest.approx(0.0, abs=1e-6)

    def test_sac_policy_sample(self, rng):
        model = TanhDiagGaussianMLPPolicy(act_dim=3)
        params = model.init(rng, jnp.zeros((2, 8)))
        obs = jax.random.normal(rng, (16, 8))
        a, logp = model.apply(params, obs, jax.random.fold_in(rng, 1), method=TanhDiagGaussianMLPPolicy.sample)
        assert a.shape == (16, 3) and logp.shape == (16, 1)
        mean_a = model.apply(params, obs, method=TanhDiagGaussianMLPPolicy.mean_action)
        assert float(jnp.max(jnp.abs(mean_a))) <= 1.0

    def test_ppo_policy_logprob_consistency(self, rng):
        model = DiagGaussianMLPPolicy(act_dim=3)
        params = model.init(rng, jnp.zeros((2, 8)))
        obs = jax.random.normal(rng, (16, 8))
        a, logp, ent = model.apply(params, obs, jax.random.fold_in(rng, 7), method=DiagGaussianMLPPolicy.sample)
        logp2, ent2 = model.apply(params, obs, a, method=DiagGaussianMLPPolicy.logprob_entropy)
        np.testing.assert_allclose(np.asarray(logp), np.asarray(logp2), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ent), np.asarray(ent2), rtol=1e-5)
