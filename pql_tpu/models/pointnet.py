"""Point-cloud encoders (reference pql/models/pointnet.py).

Channel-last JAX re-implementation: the reference's Conv1d(kernel_size=1)
stacks are per-point Dense layers, so on TPU they become [B, N, C] matmuls
that tile straight onto the MXU (no transpose dance, reference
pointnet.py:37 transposes to channel-first for torch Conv1d).

- MultiStagePointNetEncoder (pointnet.py:18-50): per-point features with a
  max-pooled global context re-injected at every stage, multi-stage
  feature concat, final global max-pool.
- StateEncoder (pointnet.py:93-119) / Encoder (pointnet.py:121-155):
  state MLP and state+pointcloud fusion used by the diffusion and vision
  policies.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from pql_tpu.models.mlp import TorchLinear


class MLP(nn.Module):
    """create_mlp analog (reference pointnet.py:53-90): Dense+act stack."""

    out_dim: int
    hidden: Sequence[int]
    act: str = "relu"
    squash_output: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = getattr(nn, self.act)
        for h in self.hidden:
            x = TorchLinear(h, dtype=self.dtype)(x)
            x = act(x)
        if self.out_dim > 0:
            x = TorchLinear(self.out_dim, dtype=self.dtype)(x)
        if self.squash_output:
            x = jnp.tanh(x)
        return x


class MultiStagePointNetEncoder(nn.Module):
    """Multi-stage PointNet with global-context reinjection
    (reference pointnet.py:18-50). Input [B, N, 3] → [B, out_channels]."""

    h_dim: int = 128
    out_channels: int = 128
    num_layers: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pc):
        act = nn.leaky_relu  # negative_slope 0.0 == relu, keep reference name
        y = act(TorchLinear(self.h_dim, dtype=self.dtype, name="conv_in")(pc))
        feats = []
        for i in range(self.num_layers):
            y = act(TorchLinear(self.h_dim, dtype=self.dtype, name=f"layer_{i}")(y))
            y_global = jnp.max(y, axis=-2, keepdims=True)  # [B, 1, h]
            y = jnp.concatenate([y, jnp.broadcast_to(y_global, y.shape)], axis=-1)
            y = act(TorchLinear(self.h_dim, dtype=self.dtype, name=f"global_{i}")(y))
            feats.append(y)
        x = jnp.concatenate(feats, axis=-1)
        x = TorchLinear(self.out_channels, dtype=self.dtype, name="conv_out")(x)
        return jnp.max(x, axis=-2)  # global max pool over points


class StateEncoder(nn.Module):
    """State-only MLP head (reference pointnet.py:93-119)."""

    state_mlp_size: tuple = (64, 64)
    dtype: jnp.dtype = jnp.float32

    @property
    def output_dim(self):
        return self.state_mlp_size[-1]

    @nn.compact
    def __call__(self, state):
        return MLP(
            self.state_mlp_size[-1], self.state_mlp_size[:-1], dtype=self.dtype
        )(state)


class Encoder(nn.Module):
    """state + pointcloud fusion (reference pointnet.py:121-155):
    concat(pointnet(pc), state_mlp(state))."""

    pointcloud_feature_dim: int = 1024
    state_mlp_size: tuple = (64, 64)
    dtype: jnp.dtype = jnp.float32

    @property
    def n_output_channels(self):
        return self.pointcloud_feature_dim + self.state_mlp_size[-1]

    @nn.compact
    def __call__(self, state, pc):
        pn_feat = MultiStagePointNetEncoder(
            out_channels=self.pointcloud_feature_dim, dtype=self.dtype
        )(pc)
        state_feat = MLP(
            self.state_mlp_size[-1], self.state_mlp_size[:-1], dtype=self.dtype
        )(state)
        return jnp.concatenate([pn_feat, state_feat], axis=-1)
