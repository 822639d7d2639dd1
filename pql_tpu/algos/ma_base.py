"""Shared machinery for the two-agent (right/left) algorithm family.

The reference's 17 bimanual agents (reference pql/algo/ippo.py, mappo.py,
iddpg.py, eq*.py, ppoteam*.py, qtotv*.py, iart.py) share a template:
slice the joint obs into per-hand views through a SymmetryManager, act per
hand, merge actions for the sim, split named reward terms per hand, and
run PPO/DDPG updates per hand. This module holds the reusable pieces:

- ``MultiAgentCtx``: resolved spec + manager + jax-friendly helpers,
- ``gae``: the reference GAE recursion with timeout XOR-masking
  (reference ippo.py:124-166 == ppo.py:75-116) as a standalone scan,
- ``ppo_actor_loss`` / ``ppo_value_loss``: the clipped losses every PPO
  variant shares (reference ippo.py:207-248),
- ``normalize_advantages``: per-minibatch advantage whitening.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from pql_tpu.envs.base import VecEnv
from pql_tpu.models import get_model
from pql_tpu.models.emlp import concat_reps, perm_sign_rep, sign_rep
from pql_tpu.utils.symmetry import EquivarianceSpec, MultiAgentSpec, SymmetryManager


class MultiAgentCtx:
    """Binds a VecEnv's MultiAgentSpec to a SymmetryManager and builds
    per-hand models (the role of the reference ac_base "Equivariant"
    construction branch, pql/algo/ac_base.py:32-42, and the per-agent
    model setup in ippo.py:22-33 / eqs.py:22-36)."""

    def __init__(self, env: VecEnv, symmetric_envs: bool | None = None):
        spec: MultiAgentSpec | None = env.multi
        if spec is None:
            raise ValueError(
                f"Task '{type(env.task).__name__}' has no MultiAgentSpec; "
                "multi-agent algorithms need a bimanual task "
                "(e.g. task=BimanualReacher)"
            )
        if symmetric_envs is None:
            symmetric_envs = bool(getattr(env.task, "symmetric", False))
        self.spec = spec
        self.manager = SymmetryManager(spec, symmetric_envs)
        self.obs_dims = spec.single_agent_obs_dim
        self.action_dim = spec.single_agent_action_dim
        self.shared_obs_dim = spec.shared_obs_dim
        self.eq: EquivarianceSpec | None = getattr(env.task, "equivariance", None)

    # --------------------------------------------------- C2 rep generators

    def _require_eq(self, name: str) -> EquivarianceSpec:
        if self.eq is None:
            raise ValueError(
                f"Model '{name}' is equivariant but task "
                f"'{type(self.manager).__name__}' provides no EquivarianceSpec"
            )
        return self.eq

    def obs_gen(self, side: int):
        eq = self._require_eq("obs")
        if eq.obs_perms is not None:
            return perm_sign_rep(eq.obs_perms[side], eq.obs_signs[side])
        return sign_rep(eq.obs_signs[side])

    def act_gen(self):
        eq = self._require_eq("act")
        if eq.act_perm is not None:
            return perm_sign_rep(eq.act_perm, eq.act_signs)
        return sign_rep(eq.act_signs)

    def joint_obs_gen(self):
        """Rep on the joint obs = right block ⊕ left block (used by central
        equivariant critics, reference eqsc.py:30 on obs_dim[2])."""
        return concat_reps(self.obs_gen(0), self.obs_gen(1))

    # ----------------------------------------------------- model builders

    def make_actor(self, cfg, dtype, side: int = 0):
        cls = get_model(cfg.algo.act_class)
        if "Equivariant" in cfg.algo.act_class:
            return cls(gen_in=self.obs_gen(side), gen_out=self.act_gen(), dtype=dtype)
        return cls(act_dim=self.action_dim, dtype=dtype)

    def make_critic(self, cfg, dtype, side: int = 0, central: bool = False):
        cls = get_model(cfg.algo.cri_class)
        if "Equivariant" in cfg.algo.cri_class:
            gen = self.joint_obs_gen() if central else self.obs_gen(side)
            if cfg.algo.cri_class == "DoubleQEquivariant":
                return cls(gen_obs=gen, gen_act=self.act_gen(), dtype=dtype)
            return cls(gen_in=gen, dtype=dtype)
        return cls(dtype=dtype)

    def split_obs(self, obs, tracker):
        return self.manager.get_multi_agent_obs(obs, tracker)

    def merge_actions(self, act_right, act_left, tracker):
        return self.manager.get_execute_action(act_right, act_left, tracker)

    def split_reward(self, info, tracker):
        return self.manager.get_multi_agent_rew(info["detailed_reward"], tracker)


def gae(
    rewards: jax.Array,  # [T, B]
    dones: jax.Array,  # [T, B] — done that PRODUCED obs[t] (ippo.py:85)
    values: jax.Array,  # [T, B]
    truncated: jax.Array,  # [T, B]
    next_value: jax.Array,  # [B]
    next_done: jax.Array,  # [B]
    gamma: float,
    lam: float,
    use_gae: bool = True,
):
    """(advantages, returns), both [T, B] (reference ippo.py:124-166)."""

    def step(carry, xs):
        lastgaelam, nextvalues, nextnonterminal = carry
        reward, done, value, trunc = xs
        nextnonterminal2 = jnp.logical_xor(nextnonterminal > 0.5, trunc > 0.5).astype(
            jnp.float32
        )
        if not use_gae:
            ret = reward + gamma * nextnonterminal * nextvalues
            return (ret, ret, 1.0 - done), ret
        delta = reward + gamma * nextvalues * nextnonterminal2 - value
        lastgaelam = delta + gamma * lam * nextnonterminal * lastgaelam
        return (lastgaelam, value, 1.0 - done), lastgaelam

    init = (jnp.zeros_like(next_value), next_value, 1.0 - next_done)
    _, out = jax.lax.scan(step, init, (rewards, dones, values, truncated), reverse=True)
    if use_gae:
        advantages = out
        returns = advantages + values
    else:
        returns = out
        advantages = returns - values
    return advantages, returns


def normalize_advantages(adv: jax.Array) -> jax.Array:
    return (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)


def ppo_actor_loss(logp_new, logp_old, adv, entropy, ratio_clip, lambda_entropy):
    """Clipped-ratio surrogate + entropy bonus (reference ippo.py:207-223)."""
    ratio = jnp.exp(logp_new - logp_old)
    l1 = -adv * ratio
    l2 = -adv * jnp.clip(ratio, 1.0 - ratio_clip, 1.0 + ratio_clip)
    return jnp.mean(jnp.maximum(l1, l2)) - lambda_entropy * jnp.mean(entropy)


def ppo_value_loss(v_new, returns, v_old, ratio_clip, value_clip: bool):
    """Optionally clipped value loss (reference ippo.py:229-248)."""
    if value_clip:
        unclipped = jnp.square(v_new - returns)
        v_clipped = v_old + jnp.clip(v_new - v_old, -ratio_clip, ratio_clip)
        return 0.5 * jnp.mean(jnp.maximum(unclipped, jnp.square(v_clipped - returns)))
    return 0.5 * jnp.mean(jnp.square(v_new - returns))


def epoch_minibatches(rng, data: tuple, batch_size: int):
    """Shuffle + reshape into [n_mb, batch_size, ...] (ippo.py:191-200)."""
    n = data[0].shape[0]
    perm = jax.random.permutation(rng, n)
    n_mb = n // batch_size
    return tuple(
        x[perm][: n_mb * batch_size].reshape((n_mb, batch_size) + x.shape[1:])
        for x in data
    )


def flat(x: jax.Array) -> jax.Array:
    """[T, B, ...] -> [T*B, ...]."""
    return x.reshape((-1,) + x.shape[2:])


def loss_metrics(losses: dict) -> dict:
    """Map loss-dict keys to the reference's metric names:
    'actor' → 'train/actor_loss', 'actor_left' → 'train/actor_loss_left',
    'critic_tot' → 'train/critic_loss_tot' (reference ippo.py:269-277,
    eqsd.py:305-312)."""
    out = {}
    for k, v in losses.items():
        head, _, tail = k.partition("_")
        name = f"train/{head}_loss" + (f"_{tail}" if tail else "")
        out[name] = jnp.mean(v)
    return out
