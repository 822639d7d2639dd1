"""Distribution math for the stochastic policies.

The reference builds torch distribution objects (Independent(Normal(...)),
SquashedNormal — reference pql/models/mlp.py:57-61, pql/utils/
torch_util.py:15-65). Here the same math is exposed as pure functions with
explicit PRNG keys, which trace cleanly under jit/vmap.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_SQRT_2PI = math.log(math.sqrt(2.0 * math.pi))
_LOG_2 = math.log(2.0)


# --- diagonal Gaussian (Independent(Normal), reference mlp.py:57-61) ---


def diag_gaussian_sample(rng, mean, log_std):
    return mean + jnp.exp(log_std) * jax.random.normal(rng, mean.shape, mean.dtype)


def diag_gaussian_logprob(x, mean, log_std):
    """Sum of per-dim Normal logprobs (Independent reinterprets the last axis)."""
    var = jnp.exp(2.0 * log_std)
    logp = -0.5 * jnp.square(x - mean) / var - log_std - _LOG_SQRT_2PI
    return jnp.sum(logp, axis=-1)


def diag_gaussian_entropy(log_std):
    """Entropy summed over action dims: Σ (0.5 + 0.5 log 2π + log σ)."""
    return jnp.sum(0.5 + _LOG_SQRT_2PI + log_std, axis=-1)


def diag_gaussian_kl(mean_p, log_std_p, mean_q, log_std_q):
    """KL(p ‖ q) for diagonal Gaussians, summed over the last axis."""
    var_p = jnp.exp(2.0 * log_std_p)
    var_q = jnp.exp(2.0 * log_std_q)
    kl = log_std_q - log_std_p + (var_p + jnp.square(mean_p - mean_q)) / (2.0 * var_q) - 0.5
    return jnp.sum(kl, axis=-1)


# --- squashed (tanh) Gaussian (reference torch_util.py:15-65) ---


def tanh_log_det_jacobian(u):
    """log|d tanh(u)/du| via the numerically stable identity
    2(log2 - u - softplus(-2u)) (reference torch_util.py:60-65)."""
    return 2.0 * (_LOG_2 - u - jax.nn.softplus(-2.0 * u))


def squashed_gaussian_sample_logprob(rng, mu, log_std):
    """a = tanh(u), u ~ N(mu, std); returns (a, logp) with logp summed and
    kept as a trailing singleton like the reference
    (mlp.py:170-174: .sum(-1, keepdim=True))."""
    std = jnp.exp(log_std)
    u = mu + std * jax.random.normal(rng, mu.shape, mu.dtype)
    a = jnp.tanh(u)
    logp_u = -0.5 * jnp.square((u - mu) / std) - log_std - _LOG_SQRT_2PI
    logp = jnp.sum(logp_u - tanh_log_det_jacobian(u), axis=-1, keepdims=True)
    return a, logp
