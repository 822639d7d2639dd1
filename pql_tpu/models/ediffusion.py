"""Equivariant diffusion policy (reference pql/models/ediffusion.py).

Same DDPM ε-prediction loop as ``pql_tpu.models.diffusion`` but the noise
net is a G-equivariant EMLP: input rep = trivial^dim (time embedding) ⊕
obs rep ⊕ action rep (× horizon), output rep = action rep (× horizon)
(reference ediffusion.py:50-62). The time embedding itself comes from an
unconstrained MLP — valid because the timestep is a G-invariant scalar,
so its features are trivial-rep by construction (ediffusion.py:41-46
declares them irrep_0).

Equivariance of the whole sampler: if the conditioning obs is transformed
by g, the ε-field transforms by g_act, and because the DDPM step is
linear in (x, ε) the action distribution is exactly g-equivariant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pql_tpu.models.diffusion import SinusoidalPosEmb, mish
from pql_tpu.models.emlp import EMLP, concat_reps, sign_rep
from pql_tpu.models.mlp import TorchLinear
from pql_tpu.ops.ddpm import ddpm_add_noise, ddpm_sample, make_ddpm_schedule


def _trivial_rep(dim: int) -> tuple:
    return sign_rep((1.0,) * dim)


class EquivariantDiffusionNet(nn.Module):
    """ε-prediction EMLP on concat(t_emb, cond, x)
    (reference ediffusion.py:27-76; hidden 512, 4 layers mirroring
    EMLPNew's [1024, 512, 512, 256] budget)."""

    gen_obs: tuple
    gen_act: tuple  # rep of ONE action block; horizon copies are summed
    horizon: int = 1
    dim: int = 256
    hidden_units: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time, cond):
        t = SinusoidalPosEmb(self.dim)(time)
        t = TorchLinear(self.dim * 4, dtype=self.dtype)(t)
        t = mish(t)
        t = TorchLinear(self.dim, dtype=self.dtype)(t)

        act_blocks = [self.gen_act] * self.horizon
        gen_in = concat_reps(_trivial_rep(self.dim), self.gen_obs, *act_blocks)
        gen_out = concat_reps(*act_blocks) if self.horizon > 1 else self.gen_act
        inp = jnp.concatenate([t, cond, x], axis=-1)
        return EMLP(gen_in, gen_out, self.hidden_units, dtype=self.dtype)(inp)


class EquivariantDiffusionPolicy(nn.Module):
    """DDPM policy with equivariant noise net (reference
    ediffusion.py:79-164). get_actions returns the FIRST action block of
    the denoised horizon (ediffusion.py:135)."""

    gen_obs: tuple
    gen_act: tuple
    diffusion_iter: int = 5
    horizon: int = 1
    dtype: jnp.dtype = jnp.float32

    @property
    def action_dim(self):
        return len(self.gen_act)

    def setup(self):
        self.net = EquivariantDiffusionNet(
            self.gen_obs, self.gen_act, self.horizon, dtype=self.dtype
        )
        self.sched = make_ddpm_schedule(self.diffusion_iter)

    def __call__(self, obs, rng):
        return self.get_actions(obs, rng)

    def get_actions(self, obs, rng):
        b = obs.shape[0]
        d = self.action_dim * self.horizon

        def eps_fn(x, t_batch):
            return self.net(x, t_batch, obs)

        if self.is_initializing():
            eps_fn(jnp.zeros((b, d)), jnp.zeros((b,)))
            return jnp.zeros((b, self.action_dim))

        out = ddpm_sample(self.sched, eps_fn, (b, d), rng)
        return out[:, : self.action_dim]

    def get_loss(self, obs, action, rng):
        """ε-MSE (reference ediffusion.py:137-164)."""
        k_noise, k_t = jax.random.split(rng)
        noise = jax.random.normal(k_noise, action.shape, action.dtype)
        timesteps = jax.random.randint(k_t, (action.shape[0],), 0, self.diffusion_iter)
        noisy = ddpm_add_noise(self.sched, action, noise, timesteps)
        eps = self.net(noisy, timesteps.astype(jnp.float32), obs)
        return jnp.mean(jnp.square(eps - noise))
