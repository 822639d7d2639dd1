"""DDPM noise scheduler, JAX-native (replaces diffusers.DDPMScheduler).

The reference's diffusion policies drive a diffusers DDPMScheduler with
``beta_schedule='squaredcos_cap_v2'``, ``clip_sample=True``,
``prediction_type='epsilon'`` (reference pql/models/diffusion.py:152-158,
ediffusion.py:93-100). This module reproduces exactly that configuration
as pure functions over a precomputed schedule pytree, so the reverse
diffusion loop runs as a `lax.scan` inside jit (the reference iterates on
the host, diffusion.py:173-193).

Semantics matched to diffusers (scheduling_ddpm.py):
- squaredcos_cap_v2: ᾱ(t) = cos²(((t/T)+0.008)/1.008 · π/2),
  β_i = min(1 − ᾱ((i+1)/T)/ᾱ(i/T), 0.999)
- add_noise: x_t = √ᾱ_t x₀ + √(1−ᾱ_t) ε
- step (variance_type='fixed_small'): x̂₀ = (x_t − √(1−ᾱ_t) ε̂)/√ᾱ_t,
  clipped to [−1, 1]; posterior mean from x̂₀ and x_t; variance
  β̃_t = (1−ᾱ_{t−1})/(1−ᾱ_t)·β_t (clamped ≥ 1e−20), noise added for t>0.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DDPMSchedule:
    betas: jax.Array  # [T]
    alphas: jax.Array  # [T]
    alphas_cumprod: jax.Array  # [T]
    num_timesteps: int = struct.field(pytree_node=False)
    clip_sample: bool = struct.field(pytree_node=False, default=True)


def make_ddpm_schedule(num_timesteps: int, clip_sample: bool = True) -> DDPMSchedule:
    t = jnp.arange(num_timesteps + 1, dtype=jnp.float32) / num_timesteps

    def alpha_bar(x):
        return jnp.cos((x + 0.008) / 1.008 * math.pi / 2.0) ** 2

    betas = jnp.minimum(1.0 - alpha_bar(t[1:]) / alpha_bar(t[:-1]), 0.999)
    alphas = 1.0 - betas
    return DDPMSchedule(
        betas=betas,
        alphas=alphas,
        alphas_cumprod=jnp.cumprod(alphas),
        num_timesteps=num_timesteps,
        clip_sample=clip_sample,
    )


def ddpm_add_noise(sched: DDPMSchedule, x0, noise, timesteps):
    """Forward process q(x_t | x₀) (diffusers add_noise)."""
    a_bar = sched.alphas_cumprod[timesteps]
    shape = (-1,) + (1,) * (x0.ndim - 1)
    return jnp.sqrt(a_bar).reshape(shape) * x0 + jnp.sqrt(1.0 - a_bar).reshape(shape) * noise


def ddpm_step(sched: DDPMSchedule, eps_pred, t, x_t, rng):
    """One reverse (ancestral) step from t to t−1 (diffusers DDPMScheduler.step)."""
    a_bar_t = sched.alphas_cumprod[t]
    a_bar_prev = jnp.where(t > 0, sched.alphas_cumprod[jnp.maximum(t - 1, 0)], 1.0)
    beta_t = sched.betas[t]
    alpha_t = sched.alphas[t]

    x0 = (x_t - jnp.sqrt(1.0 - a_bar_t) * eps_pred) / jnp.sqrt(a_bar_t)
    if sched.clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)

    coef_x0 = jnp.sqrt(a_bar_prev) * beta_t / (1.0 - a_bar_t)
    coef_xt = jnp.sqrt(alpha_t) * (1.0 - a_bar_prev) / (1.0 - a_bar_t)
    mean = coef_x0 * x0 + coef_xt * x_t

    var = jnp.maximum((1.0 - a_bar_prev) / (1.0 - a_bar_t) * beta_t, 1e-20)
    noise = jax.random.normal(rng, x_t.shape, x_t.dtype)
    return mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise


def ddpm_sample(sched: DDPMSchedule, eps_fn, shape, rng):
    """Full reverse diffusion x_T → x₀ as a lax.scan (the jitted analog of
    the reference's host loop, diffusion.py:173-193).

    eps_fn(x_t, t_batch) -> predicted noise; t_batch is float [B] (the
    reference feeds `torch.ones(B) * k`).
    """
    k_init, k_loop = jax.random.split(rng)
    x = jax.random.normal(k_init, shape)

    def body(x, inp):
        t, key = inp
        t_batch = jnp.full((shape[0],), t, jnp.float32)
        eps = eps_fn(x, t_batch)
        return ddpm_step(sched, eps, t, x, key), None

    ts = jnp.arange(sched.num_timesteps - 1, -1, -1)
    keys = jax.random.split(k_loop, sched.num_timesteps)
    x, _ = jax.lax.scan(body, x, (ts, keys))
    return x
