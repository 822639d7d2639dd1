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

Two tiers:

- **C2 fast path** (EMLP/EquivariantLinear): order-2 groups — the
  reflection symmetry of the bimanual tasks, the only group the
  reference's bidex configs instantiate. Reps are signed permutations
  given by their generator matrix; hidden layers carry multiplicities of
  the regular representation (pairs of channels swapped by the
  generator), on which any pointwise activation is exactly equivariant —
  the finite-group case of the reference's FourierPointwise
  (emlp.py:149-168).
- **General finite groups** (FiniteGroup/GroupEquivariantLinear/
  GroupEMLP): any finite matrix group closed from generators (Cn, Dn,
  …), matching escnn's finite-group generality. Same group-averaged
  projector, summed over the full element list; hidden layers carry the
  group's regular representation built from the multiplication table.

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
# general finite groups (beyond C2 — escnn-parity scope, reference emlp.py
# supports any escnn finite group even though the bidex configs only ever
# instantiate C2)
# ---------------------------------------------------------------------------


class FiniteGroup:
    """A finite matrix group closed from generators, with index-aligned
    representations on several spaces.

    ``spaces`` maps a name to that space's generator list (one generator
    matrix per abstract generator, same order across spaces). The closure
    is computed on the direct sum of all spaces (the most faithful rep
    available), producing one word list; each space's element list is the
    evaluation of those words in its own generators — so element i means
    the SAME abstract group element in every space, which is what the
    group-averaged projector needs.
    """

    def __init__(self, max_order: int = 512, **spaces: Sequence[tuple]):
        if not spaces:
            raise ValueError("need at least one space of generators")
        names = list(spaces)
        n_gens = len(spaces[names[0]])
        if any(len(spaces[n]) != n_gens for n in names):
            raise ValueError("every space needs one matrix per abstract generator")
        sum_gens = [
            np.asarray(
                concat_reps(*(spaces[n][k] for n in names)), np.float64
            )
            for k in range(n_gens)
        ]
        d = sum_gens[0].shape[0]
        elems: list[np.ndarray] = [np.eye(d)]
        words: list[tuple[int, ...]] = [()]

        def _find(m: np.ndarray) -> int | None:
            for i, e in enumerate(elems):
                if np.allclose(e, m, atol=1e-6):
                    return i
            return None

        frontier = [0]
        while frontier:
            new: list[int] = []
            for idx in frontier:
                for gi, g in enumerate(sum_gens):
                    m = elems[idx] @ g
                    if _find(m) is None:
                        elems.append(m)
                        words.append(words[idx] + (gi,))
                        new.append(len(elems) - 1)
                        if len(elems) > max_order:
                            raise ValueError(
                                f"group closure exceeded max_order={max_order}"
                            )
            frontier = new

        self.order = len(elems)
        self.words = tuple(words)
        # multiplication table from the faithful direct-sum rep
        self.mul = tuple(
            tuple(_find(a @ b) for b in elems) for a in elems
        )
        if any(None in row for row in self.mul):
            raise ValueError("generators do not close into a group")
        self._elements: dict[str, tuple] = {}
        for n in names:
            gens = [np.asarray(g, np.float64) for g in spaces[n]]
            dim = gens[0].shape[0]
            mats = []
            for w in words:
                m = np.eye(dim)
                for gi in w:
                    m = m @ gens[gi]
                mats.append(m.astype(np.float32))
            self._elements[n] = tuple(tuple(map(tuple, m)) for m in mats)

    def elements(self, space: str) -> tuple:
        """Index-aligned element matrices of ``space``'s representation."""
        return self._elements[space]

    def regular_elements(self, multiplicity: int = 1) -> tuple:
        """Element matrices of ``multiplicity`` copies of the regular
        representation (channels indexed block-major: [copy, group
        element]; element j sends channel a → mul[a][j], a permutation —
        pointwise activations are exactly equivariant on it)."""
        n = self.order
        mats = []
        for j in range(n):
            r = np.zeros((n, n), np.float32)
            for a in range(n):
                r[a, self.mul[a][j]] = 1.0
            if multiplicity > 1:
                r = np.kron(np.eye(multiplicity, dtype=np.float32), r)
            mats.append(r)
        return tuple(tuple(map(tuple, m)) for m in mats)


def cyclic_rotation2d(n: int) -> tuple:
    """Generator of Cn acting on a 2-D row vector by rotation 2π/n.
    Exact for n ∈ {1,2,4} (signed permutations); float otherwise."""
    c, s = np.cos(2 * np.pi / n), np.sin(2 * np.pi / n)
    return tuple(map(tuple, np.array([[c, s], [-s, c]], np.float32)))


# ---------------------------------------------------------------------------
# layers — general finite group
# ---------------------------------------------------------------------------


class GroupEquivariantLinear(nn.Module):
    """Linear layer constrained to the G-equivariant subspace for ANY
    finite group, by averaging over the full element list:

        W ← (1/|G|) Σ_g ρ_in(g) W ρ_out(g)ᵀ

    the orthogonal projector onto {W : ρ_in(g) W = W ρ_out(g) ∀g} when
    both reps are orthogonal (true for the permutation / signed-
    permutation / rotation reps used here; escnn equivalent:
    escnn.nn.Linear over any escnn finite group, reference emlp.py:98-100).
    ``elems_in`` / ``elems_out`` must be index-aligned element lists of
    the SAME abstract group (FiniteGroup.elements)."""

    elems_in: tuple
    elems_out: tuple
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g_in = jnp.asarray(np.asarray(self.elems_in, np.float32))  # [n,di,di]
        g_out = jnp.asarray(np.asarray(self.elems_out, np.float32))  # [n,do,do]
        d_in, d_out = g_in.shape[-1], g_out.shape[-1]
        w = self.param("kernel", torch_kernel_init, (d_in, d_out))
        b = self.param(
            "bias",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -1.0 / np.sqrt(d_in), 1.0 / np.sqrt(d_in)
            ),
            (d_out,),
        )
        n = g_in.shape[0]
        w_eq = jnp.einsum("gij,jk,glk->il", g_in, w, g_out) / n
        b_eq = jnp.einsum("k,glk->l", b, g_out) / n
        return (
            jnp.dot(x.astype(self.dtype), w_eq.astype(self.dtype))
            + b_eq.astype(self.dtype)
        )


class GroupEMLP(nn.Module):
    """Equivariant MLP over any finite group (the general-group form of
    EMLP below; escnn-parity scope — the reference's escnn stack accepts
    any finite group even though its configs only build C2).

    Hidden layers carry multiplicities of the group's REGULAR
    representation, built at trace time from the multiplication table
    ``mul`` (FiniteGroup.mul): element j permutes each block's channels
    a → mul[a][j], so any pointwise activation is exactly equivariant
    (the finite-group Fourier-pointwise, reference emlp.py:149-168).

    ``out``: an element list (equivariant head) or an int out_dim —
    invariant head via per-block channel SORT (a permutation within each
    regular block fixes the sorted vector exactly, and the sorted
    coordinates preserve the full multiset, strictly richer than norm
    pooling) + unconstrained linear.
    """

    elems_in: tuple
    out: tuple | int
    mul: tuple  # group multiplication table, FiniteGroup.mul
    hidden_units: int = 256
    num_layers: int = 5
    dtype: jnp.dtype = jnp.float32

    def _regular(self, multiplicity: int) -> tuple:
        n = len(self.mul)
        mats = []
        for j in range(n):
            r = np.zeros((n, n), np.float32)
            for a in range(n):
                r[a, self.mul[a][j]] = 1.0
            if multiplicity > 1:
                r = np.kron(np.eye(multiplicity, dtype=np.float32), r)
            mats.append(r)
        return tuple(tuple(map(tuple, m)) for m in mats)

    @nn.compact
    def __call__(self, x):
        n = len(self.mul)
        mult = max(ceil(self.hidden_units / n), 1)
        reg = self._regular(mult)
        elems = self.elems_in
        for _ in range(self.num_layers - 1):
            x = GroupEquivariantLinear(elems, reg, dtype=self.dtype)(x)
            x = nn.elu(x)
            elems = reg
        if isinstance(self.out, int):
            h = x.reshape(x.shape[:-1] + (mult, n))
            inv = jnp.sort(h, axis=-1).reshape(x.shape[:-1] + (mult * n,))
            x = TorchLinear(self.out, dtype=self.dtype)(inv)
        else:
            x = GroupEquivariantLinear(elems, self.out, dtype=self.dtype)(x)
        return x.astype(jnp.float32)


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
