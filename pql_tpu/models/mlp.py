"""MLP policy/critic zoo (reference pql/models/mlp.py).

Flax re-implementations of the reference torch modules, keeping class names
so configs are drop-in (``algo.act_class=TanhMLPPolicy`` etc., reference
pql/cfg/algo/pql_algo.yaml:13-14):

- MLPNet            (mlp.py:27-40)   — [512, 256, 128] ELU trunk
- TanhMLPPolicy     (mlp.py:177-179) — deterministic tanh policy (PQL/DDPG)
- DiagGaussianMLPPolicy (mlp.py:43-75) — PPO policy, state-independent logstd
- TanhDiagGaussianMLPPolicy (mlp.py:144-174) — SAC squashed Gaussian
- DoubleQ           (mlp.py:186-203) — twin Q heads, min-Q helper
- DoubleQBatchNorm  (mlp.py:224-241) — CrossQ critic (BatchNorm, no target)
- DistributionalDoubleQ (mlp.py:244-267) — C51 twin categorical heads
- MLPCritic         (mlp.py:270-278) — state-value head

Stochastic-policy sampling is functional (explicit rng) rather than via
distribution objects; the distribution math lives in
``pql_tpu.models.distributions``.

Initialization matches torch.nn.Linear's default (kaiming-uniform kernel,
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) bias) so learning dynamics are
comparable to the reference, not flax's lecun_normal.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pql_tpu.models import distributions as D

DEFAULT_HIDDEN = (512, 256, 128)


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchLinear(nn.Module):
    """Dense layer with torch-default init and configurable compute dtype."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init, (in_features, self.features))
        bias = self.param(
            "bias",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -1.0 / jnp.sqrt(in_features), 1.0 / jnp.sqrt(in_features)
            ),
            (self.features,),
        )
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype)) + bias.astype(self.dtype)
        return y


class MLPNet(nn.Module):
    """ELU MLP trunk, default hidden [512, 256, 128] (reference mlp.py:33)."""

    out_dim: int
    hidden: Sequence[int] = DEFAULT_HIDDEN
    use_batchnorm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for h in self.hidden:
            x = TorchLinear(h, dtype=self.dtype)(x)
            if self.use_batchnorm:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, dtype=self.dtype
                )(x)
            x = nn.elu(x)
        x = TorchLinear(self.out_dim, dtype=self.dtype)(x)
        return x.astype(jnp.float32)


class TanhMLPPolicy(nn.Module):
    """Deterministic tanh-squashed policy (reference mlp.py:177-179)."""

    act_dim: int
    hidden: Sequence[int] = DEFAULT_HIDDEN
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        return jnp.tanh(MLPNet(self.act_dim, self.hidden, dtype=self.dtype)(obs))


class DiagGaussianMLPPolicy(nn.Module):
    """Gaussian policy with state-independent log-std parameter
    (reference mlp.py:43-75); used by PPO."""

    act_dim: int
    hidden: Sequence[int] = DEFAULT_HIDDEN
    init_log_std: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        mean = MLPNet(self.act_dim, self.hidden, dtype=self.dtype)(obs)
        # explicit dtype: a weak-typed init would flip weak_type after the
        # first optimizer update and force a second jit trace of train_iter
        log_std = self.param(
            "logstd",
            lambda key, shape: jnp.full(shape, self.init_log_std, jnp.float32),
            (self.act_dim,),
        )
        return mean, jnp.broadcast_to(log_std, mean.shape)

    def sample(self, obs, rng):
        """rsample + logprob + entropy (reference get_actions_logprob_entropy)."""
        mean, log_std = self(obs)
        action = D.diag_gaussian_sample(rng, mean, log_std)
        logp = D.diag_gaussian_logprob(action, mean, log_std)
        ent = D.diag_gaussian_entropy(log_std)
        return action, logp, ent

    def logprob_entropy(self, obs, actions):
        mean, log_std = self(obs)
        return (
            D.diag_gaussian_logprob(actions, mean, log_std),
            D.diag_gaussian_entropy(log_std),
        )


class TanhDiagGaussianMLPPolicy(nn.Module):
    """SAC squashed-Gaussian policy (reference mlp.py:144-174):
    trunk emits (mu, log_std), log_std clamped to [-5, 5]."""

    act_dim: int
    hidden: Sequence[int] = DEFAULT_HIDDEN
    log_std_min: float = -5.0
    log_std_max: float = 5.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        out = MLPNet(2 * self.act_dim, self.hidden, dtype=self.dtype)(obs)
        mu, log_std = jnp.split(out, 2, axis=-1)
        log_std = jnp.clip(log_std, self.log_std_min, self.log_std_max)
        return mu, log_std

    def mean_action(self, obs):
        mu, _ = self(obs)
        return jnp.tanh(mu)

    def sample(self, obs, rng):
        """tanh(rsample) with stable log-det (reference torch_util.py:15-65)."""
        mu, log_std = self(obs)
        return D.squashed_gaussian_sample_logprob(rng, mu, log_std)


class EnsembleLinear(nn.Module):
    """n independent Dense layers evaluated as ONE batched matmul
    ([n, B, d] · [n, d, h] einsum) — the twin-critic layout that keeps the
    MXU busy instead of issuing two small matmuls (measured ~30% faster
    than two separate MLPNets at batch 8192). Per-member init matches
    torch.nn.Linear like TorchLinear. NOTE: measured end-to-end in the
    fused PQL step, the separate-MLPNet twin layout is faster (XLA
    overlaps the two chains); this layer is kept for wide ensembles."""

    features: int
    n: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: [n, B, d_in]
        d_in = x.shape[-1]
        bound = 1.0 / jnp.sqrt(d_in)
        kernel = self.param(
            "kernel",
            lambda key, shape: jax.vmap(
                lambda k: torch_kernel_init(k, (d_in, self.features))
            )(jax.random.split(key, self.n)),
            (self.n, d_in, self.features),
        )
        bias = self.param(
            "bias",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -bound, bound
            ),
            (self.n, 1, self.features),
        )
        y = jnp.einsum(
            "nbd,ndh->nbh", x.astype(self.dtype), kernel.astype(self.dtype)
        )
        return y + bias.astype(self.dtype)


class DoubleQ(nn.Module):
    """Twin Q networks on concat(obs, act) (reference mlp.py:186-203)."""

    hidden: Sequence[int] = DEFAULT_HIDDEN
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        q1 = MLPNet(1, self.hidden, dtype=self.dtype, name="net_q1")(x)
        q2 = MLPNet(1, self.hidden, dtype=self.dtype, name="net_q2")(x)
        return q1, q2

    def q_min(self, obs, act):
        q1, q2 = self(obs, act)
        return jnp.minimum(q1, q2)


class DoubleQBatchNorm(nn.Module):
    """CrossQ critic: twin Q with BatchNorm, always train-mode statistics on
    the joint (obs ∥ next_obs) batch (reference mlp.py:224-241;
    pql/algo/crossQ.py:144-157)."""

    hidden: Sequence[int] = DEFAULT_HIDDEN
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs, act, train: bool = False):
        x = jnp.concatenate([obs, act], axis=-1)
        q1 = MLPNet(1, self.hidden, use_batchnorm=True, dtype=self.dtype, name="net_q1")(
            x, train=train
        )
        q2 = MLPNet(1, self.hidden, use_batchnorm=True, dtype=self.dtype, name="net_q2")(
            x, train=train
        )
        return q1, q2

    def q_min(self, obs, act, train: bool = False):
        q1, q2 = self(obs, act, train=train)
        return jnp.minimum(q1, q2)


class DistributionalDoubleQ(nn.Module):
    """C51 twin categorical critic (reference mlp.py:244-267): each head
    emits softmax probabilities over num_atoms support points."""

    hidden: Sequence[int] = DEFAULT_HIDDEN
    v_min: float = -10.0
    v_max: float = 10.0
    num_atoms: int = 51
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        l1 = MLPNet(self.num_atoms, self.hidden, dtype=self.dtype, name="net_q1")(x)
        l2 = MLPNet(self.num_atoms, self.hidden, dtype=self.dtype, name="net_q2")(x)
        return jax.nn.softmax(l1, axis=-1), jax.nn.softmax(l2, axis=-1)

    def q_min(self, obs, act):
        """min of the two expected values (reference mlp.py:255-260)."""
        p1, p2 = self(obs, act)
        z = jnp.linspace(self.v_min, self.v_max, self.num_atoms, dtype=p1.dtype)
        return jnp.minimum(jnp.sum(p1 * z, axis=-1), jnp.sum(p2 * z, axis=-1))[..., None]


class MLPCritic(nn.Module):
    """State-value critic (reference mlp.py:270-278); used by PPO."""

    hidden: Sequence[int] = DEFAULT_HIDDEN
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        return MLPNet(1, self.hidden, dtype=self.dtype)(obs)
