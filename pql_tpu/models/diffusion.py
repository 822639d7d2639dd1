"""Diffusion policies (reference pql/models/diffusion.py).

DDPM ε-prediction policies: the conditional noise-prediction net denoises
a Gaussian action sample through `diffusion_iter` reverse steps. The
reference drives a diffusers DDPMScheduler from a host loop
(diffusion.py:163-193); here the schedule is the JAX-native
``pql_tpu.ops.ddpm`` and the reverse process is a lax.scan inside jit, so
action sampling stays on-device.

- SinusoidalPosEmb   (diffusion.py:9-21)
- DiffusionNet       (diffusion.py:24-73): time MLP (dim→4dim→dim, Mish) +
  [1024, 512, 256] Mish trunk on concat(t_emb, cond, x)
- MLPResNetBlock/MLPResNet (diffusion.py:76-128): residual MLP variant
- DiffusionPolicy    (diffusion.py:133-222): state+pointcloud-conditioned
  policy via the pointnet Encoder; ``get_actions(state, pc, rng)`` runs
  reverse diffusion, ``get_loss`` is the ε-MSE. (The reference signature
  also takes an image argument it never uses, diffusion.py:160-163.)
- StateDiffusionPolicy: state-only conditioning (the non-vision analog,
  mirroring EquivariantDiffusionPolicy's interface, ediffusion.py:79-164).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from pql_tpu.models.mlp import TorchLinear
from pql_tpu.models.pointnet import Encoder
from pql_tpu.ops.ddpm import ddpm_add_noise, ddpm_sample, make_ddpm_schedule


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class SinusoidalPosEmb(nn.Module):
    """(reference diffusion.py:9-21)."""

    dim: int

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        emb = math.log(10000.0) / (half - 1)
        freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
        ang = t[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class DiffusionNet(nn.Module):
    """ε-prediction MLP (reference diffusion.py:24-73)."""

    action_dim: int
    dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time, cond):
        t = SinusoidalPosEmb(self.dim)(time)
        t = TorchLinear(self.dim * 4, dtype=self.dtype)(t)
        t = mish(t)
        t = TorchLinear(self.dim, dtype=self.dtype)(t)
        inp = jnp.concatenate([t, cond, x], axis=-1)
        h = inp
        for width in (1024, 512, 256):
            h = mish(TorchLinear(width, dtype=self.dtype)(h))
        return TorchLinear(self.action_dim, dtype=self.dtype)(h)


class MLPResNetBlock(nn.Module):
    """(reference diffusion.py:76-105)."""

    features: int
    dropout_rate: float | None = None
    use_layer_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        if self.dropout_rate and self.dropout_rate > 0.0:
            x = nn.Dropout(rate=self.dropout_rate)(x, deterministic=deterministic)
        if self.use_layer_norm:
            x = nn.LayerNorm(dtype=self.dtype)(x)
        x = TorchLinear(self.features * 4, dtype=self.dtype)(x)
        x = mish(x)
        x = TorchLinear(self.features, dtype=self.dtype, name="dense2")(x)
        return residual + x


class MLPResNet(nn.Module):
    """(reference diffusion.py:108-128)."""

    num_blocks: int
    out_dim: int
    hidden_dim: int = 256
    dropout_rate: float = 0.1
    use_layer_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = TorchLinear(self.hidden_dim, dtype=self.dtype)(x)
        for _ in range(self.num_blocks):
            x = MLPResNetBlock(
                self.hidden_dim, self.dropout_rate, self.use_layer_norm, self.dtype
            )(x, deterministic)
        x = mish(x)
        return TorchLinear(self.out_dim, dtype=self.dtype)(x)


class StateDiffusionPolicy(nn.Module):
    """State-conditioned DDPM policy: the plain-network counterpart of
    EquivariantDiffusionPolicy (reference ediffusion.py:79-164 with the
    EMLP core swapped for DiffusionNet)."""

    action_dim: int
    diffusion_iter: int = 5
    horizon: int = 1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.net = DiffusionNet(self.action_dim * self.horizon, dtype=self.dtype)
        self.sched = make_ddpm_schedule(self.diffusion_iter)

    def __call__(self, obs, rng):
        return self.get_actions(obs, rng)

    def get_actions(self, obs, rng):
        """Reverse diffusion from Gaussian noise (ediffusion.py:104-135)."""
        b = obs.shape[0]
        d = self.action_dim * self.horizon

        def eps_fn(x, t_batch):
            return self.net(x, t_batch, obs)

        if self.is_initializing():
            # materialize params outside lax.scan (flax can't create
            # variables inside traced control flow)
            eps_fn(jnp.zeros((b, d)), jnp.zeros((b,)))
            return jnp.zeros((b, self.action_dim))

        out = ddpm_sample(self.sched, eps_fn, (b, d), rng)
        return out[:, : self.action_dim]

    def get_loss(self, obs, action, rng):
        """ε-MSE on a noised action (ediffusion.py:137-164)."""
        k_noise, k_t = jax.random.split(rng)
        noise = jax.random.normal(k_noise, action.shape, action.dtype)
        timesteps = jax.random.randint(k_t, (action.shape[0],), 0, self.diffusion_iter)
        noisy = ddpm_add_noise(self.sched, action, noise, timesteps)
        eps = self.net(noisy, timesteps.astype(jnp.float32), obs)
        return jnp.mean(jnp.square(eps - noise))


class DiffusionPolicy(nn.Module):
    """Vision diffusion policy: conditions on fused state+pointcloud
    features (reference diffusion.py:133-222; pointcloud_feature_dim=128,
    diffusion.py:144-146)."""

    action_dim: int
    diffusion_iter: int = 5
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(pointcloud_feature_dim=128, dtype=self.dtype)
        self.net = DiffusionNet(self.action_dim, dtype=self.dtype)
        self.sched = make_ddpm_schedule(self.diffusion_iter)

    def __call__(self, state, pc, rng):
        return self.get_actions(state, pc, rng)

    def get_actions(self, state, pc, rng):
        cond = self.encoder(state, pc)
        b = state.shape[0]

        def eps_fn(x, t_batch):
            return self.net(x, t_batch, cond)

        if self.is_initializing():
            eps_fn(jnp.zeros((b, self.action_dim)), jnp.zeros((b,)))
            return jnp.zeros((b, self.action_dim))

        return ddpm_sample(self.sched, eps_fn, (b, self.action_dim), rng)

    def get_loss(self, state, pc, action, rng):
        k_noise, k_t = jax.random.split(rng)
        noise = jax.random.normal(k_noise, action.shape, action.dtype)
        timesteps = jax.random.randint(k_t, (action.shape[0],), 0, self.diffusion_iter)
        noisy = ddpm_add_noise(self.sched, action, noise, timesteps)
        cond = self.encoder(state, pc)
        eps = self.net(noisy, timesteps.astype(jnp.float32), cond)
        return jnp.mean(jnp.square(eps - noise))
