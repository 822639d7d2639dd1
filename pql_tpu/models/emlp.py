"""G-equivariant MLPs, JAX-native (reference pql/models/emlp.py).

The reference builds equivariant networks with escnn: equivariant linear
maps between field types, regular-representation hidden layers, pointwise
activations, and a G-invariant head via isotypic-basis norm pooling
(reference emlp.py:14-220; wrappers in pql/models/mlp.py:78-141,181-183,
206-221). escnn parameterizes the equivariant subspace with a precomputed
basis; here the same subspace is reached by **group-averaged projection**
of an unconstrained kernel — for a finite group G, P(W) = 1/|G| Σ_g
ρ_in(g) W ρ_out(g)ᵀ is the orthogonal projector onto equivariant maps, so
training on P(W) is exactly training in escnn's basis. The projection is
two [d,d]·[d,h] matmuls per layer per forward — noise next to the batched
feature matmul, and XLA fuses it.

Scope: order-2 groups (C2 — the reflection symmetry of the bimanual
tasks, the group the reference's bidex configs instantiate). Reps are
signed permutations given by their generator matrix; hidden layers carry
multiplicities of the regular representation (pairs of channels swapped
by the generator), on which any pointwise activation is exactly
equivariant — the finite-group case of the reference's FourierPointwise
(emlp.py:149-168).

The G-invariant head reproduces irrep-norm pooling (emlp.py:190-215): per
regular-rep pair (h₀, h₁), the isotypic coordinates are t = (h₀+h₁)/√2
(trivial) and s = (h₀−h₁)/√2 (sign irrep); the invariant features are
their norms |t|, |s|, followed by an unconstrained linear head.
"""

from __future__ import annotations

from math import ceil
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pql_tpu.models import distributions as D
from pql_tpu.models.mlp import TorchLinear, torch_kernel_init

# ---------------------------------------------------------------------------
# representation helpers (C2: group = {identity, g}, g² = identity)
# ---------------------------------------------------------------------------


def sign_rep(signs: Sequence[float]) -> tuple:
    """Generator of a diagonal ±1 representation, as a nested tuple
    (hashable → usable as a static flax module field)."""
    d = len(signs)
    m = np.zeros((d, d), np.float32)
    for i, s in enumerate(signs):
        m[i, i] = float(s)
    return tuple(map(tuple, m))


def perm_sign_rep(perm: Sequence[int], signs: Sequence[float] | None = None) -> tuple:
    """Generator acting on row vectors as (x @ G)[i] = sign[i] * x[perm[i]]."""
    d = len(perm)
    signs = signs if signs is not None else [1.0] * d
    m = np.zeros((d, d), np.float32)
    for i, (p, s) in enumerate(zip(perm, signs)):
        m[int(p), i] = float(s)
    return tuple(map(tuple, m))


def concat_reps(*gens: tuple) -> tuple:
    """Direct sum (block diagonal) of generators — e.g. obs_rep ⊕ act_rep
    for a critic on concat(obs, act)."""
    mats = [np.asarray(g, np.float32) for g in gens]
    d = sum(m.shape[0] for m in mats)
    out = np.zeros((d, d), np.float32)
    o = 0
    for m in mats:
        out[o : o + m.shape[0], o : o + m.shape[0]] = m
        o += m.shape[0]
    return tuple(map(tuple, out))


def regular_rep(multiplicity: int) -> tuple:
    """multiplicity copies of the C2 regular representation: channel pairs
    (2i, 2i+1) swapped by the generator (reference hidden layers are sums
    of regular reps, emlp.py:30-34)."""
    perm = []
    for i in range(multiplicity):
        perm += [2 * i + 1, 2 * i]
    return perm_sign_rep(perm)


def check_involution(gen: tuple) -> bool:
    g = np.asarray(gen, np.float32)
    return bool(np.allclose(g @ g, np.eye(g.shape[0]), atol=1e-6))


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------


class EquivariantLinear(nn.Module):
    """Linear layer constrained to the G-equivariant subspace by projection.

    Row-vector convention y = x @ W + b with the group acting as
    x ↦ x @ G_in, y ↦ y @ G_out; equivariance ⇔ G_in W = W G_out, enforced
    by W ← (W + G_in W G_outᵀ)/2 and b ← (b + b G_outᵀ)/2 (exact projector
    for an order-2 orthogonal generator; escnn equivalent:
    escnn.nn.Linear, reference emlp.py:98-100).
    """

    gen_in: tuple
    gen_out: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d_in, d_out = len(self.gen_in), len(self.gen_out)
        w = self.param("kernel", torch_kernel_init, (d_in, d_out))
        b = self.param(
            "bias",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -1.0 / np.sqrt(d_in), 1.0 / np.sqrt(d_in)
            ),
            (d_out,),
        )
        g_in = jnp.asarray(np.asarray(self.gen_in, np.float32))
        g_out = jnp.asarray(np.asarray(self.gen_out, np.float32))
        w_eq = 0.5 * (w + g_in @ w @ g_out.T)
        b_eq = 0.5 * (b + b @ g_out.T)
        y = jnp.dot(x.astype(self.dtype), w_eq.astype(self.dtype)) + b_eq.astype(self.dtype)
        return y


class EMLP(nn.Module):
    """Equivariant MLP (reference emlp.py:14-220).

    ``out`` is either a generator tuple (equivariant head) or an int
    out_dim (G-invariant function: irrep-norm pooling + unconstrained
    linear head, emlp.py:134-142,190-215). num_layers counts linear maps
    including the head (reference wrapper uses 5: input + 3 hidden + head,
    mlp.py:92-97).
    """

    gen_in: tuple
    out: tuple | int
    hidden_units: int = 256
    num_layers: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mult = max(ceil(self.hidden_units / 2), 1)
        gen_h = regular_rep(mult)
        gen = self.gen_in
        for _ in range(self.num_layers - 1):
            x = EquivariantLinear(gen, gen_h, dtype=self.dtype)(x)
            x = nn.elu(x)
            gen = gen_h
        if isinstance(self.out, int):
            # isotypic norm pooling: per pair, |trivial| and |sign| coords
            h = x.reshape(x.shape[:-1] + (mult, 2))
            t = (h[..., 0] + h[..., 1]) * np.float32(1.0 / np.sqrt(2.0))
            s = (h[..., 0] - h[..., 1]) * np.float32(1.0 / np.sqrt(2.0))
            inv = jnp.concatenate([jnp.abs(t), jnp.abs(s)], axis=-1)
            x = TorchLinear(self.out, dtype=self.dtype)(inv)
        else:
            x = EquivariantLinear(gen, self.out, dtype=self.dtype)(x)
        return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# model-zoo wrappers (API-compatible with the non-equivariant zoo)
# ---------------------------------------------------------------------------


class EquivariantMLPNet(nn.Module):
    """Equivariant trunk (reference mlp.py:78-101)."""

    gen_in: tuple
    out: tuple | int
    hidden_units: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return EMLP(self.gen_in, self.out, self.hidden_units, dtype=self.dtype)(x)


class TanhEquivariantMLPPolicy(nn.Module):
    """tanh ∘ equivariant trunk (reference mlp.py:181-183). tanh is odd,
    so equivariance under signed permutations is preserved."""

    gen_in: tuple
    gen_out: tuple
    hidden_units: int = 256
    dtype: jnp.dtype = jnp.float32

    @property
    def act_dim(self):
        return len(self.gen_out)

    @nn.compact
    def __call__(self, obs):
        return jnp.tanh(
            EMLP(self.gen_in, self.gen_out, self.hidden_units, dtype=self.dtype)(obs)
        )


class DiagGaussianEquivariantMLPPolicy(nn.Module):
    """Gaussian policy with equivariant mean and state-independent log-std
    (reference mlp.py:104-141). API matches DiagGaussianMLPPolicy so the
    PPO-family agents swap it in by class name."""

    gen_in: tuple
    gen_out: tuple
    hidden_units: int = 256
    init_log_std: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        mean = EMLP(self.gen_in, self.gen_out, self.hidden_units, dtype=self.dtype)(obs)
        # explicit dtype — see DiagGaussianMLPPolicy: weak-typed init causes
        # a jit retrace after the first update
        log_std = self.param(
            "logstd",
            lambda key, shape: jnp.full(shape, self.init_log_std, jnp.float32),
            (len(self.gen_out),),
        )
        return mean, jnp.broadcast_to(log_std, mean.shape)

    def sample(self, obs, rng):
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


class MLPCriticEquivariant(nn.Module):
    """G-invariant state-value critic (the cri_class the reference's EQ
    agents pass with trivial output fields, e.g. eq.py:29)."""

    gen_in: tuple
    hidden_units: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        return EMLP(self.gen_in, 1, self.hidden_units, dtype=self.dtype)(obs)


class DoubleQEquivariant(nn.Module):
    """Twin G-invariant Q networks on concat(obs, act) (reference
    mlp.py:206-221); input rep = obs_rep ⊕ act_rep."""

    gen_obs: tuple
    gen_act: tuple
    hidden_units: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs, act):
        gen_in = concat_reps(self.gen_obs, self.gen_act)
        x = jnp.concatenate([obs, act], axis=-1)
        q1 = EMLP(gen_in, 1, self.hidden_units, dtype=self.dtype, name="net_q1")(x)
        q2 = EMLP(gen_in, 1, self.hidden_units, dtype=self.dtype, name="net_q2")(x)
        return q1, q2

    def q_min(self, obs, act):
        q1, q2 = self(obs, act)
        return jnp.minimum(q1, q2)
