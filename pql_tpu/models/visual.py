"""Vision encoders and visual policies (reference pql/models/visual.py).

JAX/TPU notes vs the reference:
- images are channel-LAST [..., H, W, C] (XLA's native conv layout on TPU;
  the reference is torch channel-first),
- ``ResEncoder`` reproduces the reference's architecture — a ResNet-18
  trunk cut after layer2 with temporal-difference channels and an
  fc+LayerNorm head (reference visual.py:206-271) — but trains from
  random init: the reference loads torchvision ImageNet weights
  (visual.py:210), which are not downloadable in an air-gapped TPU pod;
  the trunk is NOT frozen in the reference either, so the architecture,
  not the init, is the contract.
- ``DINOEncoder`` (reference visual.py:183-204) depends on a torch-hub
  DINOv2 download; here it is the same interface over a ViT-S-shaped
  patch encoder with random init, gated behind ``pretrained=False`` with
  a clear error if pretrained weights are requested.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pql_tpu.models import distributions as D
from pql_tpu.models.mlp import TorchLinear
from pql_tpu.models.pointnet import Encoder


# ---------------------------------------------------------------------------
# augmentation + positional encodings
# ---------------------------------------------------------------------------


def random_shifts_aug(rng: jax.Array, x: jax.Array, pad: int = 4) -> jax.Array:
    """DrQ-style random integer shift (reference RandomShiftsAug,
    visual.py:11-42): replicate-pad by `pad`, then crop at a per-image
    random offset in [0, 2·pad]. x: [B, H, W, C]."""
    b, h, w, c = x.shape
    padded = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    shifts = jax.random.randint(rng, (b, 2), 0, 2 * pad + 1)

    def crop(img, off):
        return jax.lax.dynamic_slice(img, (off[0], off[1], 0), (h, w, c))

    return jax.vmap(crop)(padded, shifts)


def fourier_encode(
    x: jax.Array, num_freqs: int, max_freq: float, include_input: bool = False
) -> jax.Array:
    """(reference visual.py:56-72)."""
    b, c = x.shape
    freqs = jnp.exp(
        jnp.linspace(0.0, math.log(max_freq + 1e-6), num_freqs, dtype=x.dtype)
    )
    xb = x[..., None] * (2.0 * math.pi) * freqs
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)
    enc = enc.reshape(b, c * 2 * num_freqs) / math.sqrt(num_freqs)
    return jnp.concatenate([x, enc], axis=-1) if include_input else enc


class TimestepEmbedder(nn.Module):
    """Fourier features + LayerNorm + Linear (reference visual.py:74-110)."""

    d_model: int
    freq_dim: int = 128
    max_freq: float = 300.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = fourier_encode(x, self.freq_dim, self.max_freq, include_input=True)
        feats = nn.LayerNorm(dtype=self.dtype)(feats)
        return TorchLinear(self.d_model, dtype=self.dtype)(feats)


class PointNetEncoderXYZ(nn.Module):
    """[64, 128, 256] per-point MLP + max pool + projection
    (reference visual.py:112-181)."""

    out_channels: int = 1024
    use_layernorm: bool = False
    final_norm: str = "none"
    use_projection: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pc):
        x = pc
        for width in (64, 128, 256):
            x = TorchLinear(width, dtype=self.dtype)(x)
            if self.use_layernorm:
                x = nn.LayerNorm(dtype=self.dtype)(x)
            x = nn.relu(x)
        x = jnp.max(x, axis=-2)
        if not self.use_projection:
            return x
        x = TorchLinear(self.out_channels, dtype=self.dtype)(x)
        if self.final_norm == "layernorm":
            x = nn.LayerNorm(dtype=self.dtype)(x)
        return x


# ---------------------------------------------------------------------------
# conv backbones
# ---------------------------------------------------------------------------


class _BasicBlock(nn.Module):
    """ResNet-18 basic block (2×3×3 conv + skip). Norm layers are
    GroupNorm instead of the reference's (pretrained-torchvision)
    BatchNorm: batch statistics are ill-posed inside a jitted on-policy
    update, and GroupNorm keeps the module state-free."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        gn = lambda c: nn.GroupNorm(num_groups=min(32, c), dtype=self.dtype)
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding="SAME", use_bias=False, dtype=self.dtype)(x)
        y = gn(self.features)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(y)
        y = gn(self.features)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(residual)
            residual = gn(self.features)(residual)
        return nn.relu(residual + y)


class ResNet18Trunk(nn.Module):
    """ResNet-18 stem + layer1 + layer2 — where the reference cuts the
    torchvision model (reference visual.py:245-248: break at 'layer2')."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), (2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=32, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")
        for _ in range(2):  # layer1: 64
            x = _BasicBlock(64, dtype=self.dtype)(x, train)
        x = _BasicBlock(128, stride=2, dtype=self.dtype)(x, train)  # layer2
        x = _BasicBlock(128, dtype=self.dtype)(x, train)
        return x


class ResEncoder(nn.Module):
    """Multi-camera frame-stack encoder (reference visual.py:206-271):
    per camera, run the T stacked frames through the ResNet trunk, build
    temporal-difference channels conv[t] − stop_grad(conv[t−1]), flatten,
    fc → LayerNorm. Input: [B, num_cams, T, H, W, 3]."""

    repr_dim: int = 1024
    num_cams: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs, train: bool = False, aug: bool = False, rng=None):
        b, cams, t, h, w, c = obs.shape
        x = obs.reshape(b * cams * t, h, w, c)
        if aug and rng is not None:
            x = random_shifts_aug(rng, x)
        conv = ResNet18Trunk(dtype=self.dtype)(x, train=train)
        hh, ww, cc = conv.shape[1:]
        conv = conv.reshape(b * cams, t, hh, ww, cc)
        cur = conv[:, 1:]
        prev = cur - jax.lax.stop_gradient(conv[:, : t - 1])
        conv = jnp.concatenate([cur, prev], axis=1)  # [B*cams, 2(T-1), h, w, c]
        conv = conv.reshape(b * cams, -1)
        out = TorchLinear(self.repr_dim, dtype=self.dtype)(conv)
        out = nn.LayerNorm(dtype=self.dtype)(out)
        return out.reshape(b, cams * self.repr_dim)


class DINOEncoder(nn.Module):
    """ViT-S/14-shaped patch encoder with the reference's interface
    (reference visual.py:183-204 wraps a torch-hub DINOv2; pretrained
    weights are not downloadable on an air-gapped pod, so this trains
    from random init — pass pretrained=True to get an explicit error)."""

    repr_dim: int = 384
    num_cams: int = 2
    patch: int = 14
    depth: int = 4
    pretrained: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs, train: bool = False):
        if self.pretrained:
            raise NotImplementedError(
                "DINOv2 pretrained weights require a torch-hub download "
                "(reference visual.py:190) — unavailable offline; use "
                "pretrained=False (random init) or ResEncoder."
            )
        b, cams, h, w, c = obs.shape
        x = obs.reshape(b * cams, h, w, c)
        # patchify via strided conv
        x = nn.Conv(self.repr_dim, (self.patch, self.patch),
                    (self.patch, self.patch), dtype=self.dtype)(x)
        x = x.reshape(x.shape[0], -1, self.repr_dim)  # [B', N, D]
        for _ in range(self.depth):
            y = nn.LayerNorm(dtype=self.dtype)(x)
            y = nn.MultiHeadDotProductAttention(num_heads=6, dtype=self.dtype)(y, y)
            x = x + y
            y = nn.LayerNorm(dtype=self.dtype)(x)
            y = TorchLinear(self.repr_dim * 4, dtype=self.dtype)(y)
            y = nn.gelu(y)
            y = TorchLinear(self.repr_dim, dtype=self.dtype)(y)
            x = x + y
        x = jnp.mean(x, axis=1)  # mean-pool patch tokens
        return x.reshape(b, cams * self.repr_dim)


# ---------------------------------------------------------------------------
# visual policy
# ---------------------------------------------------------------------------


class DiagGaussianMLPVPolicy(nn.Module):
    """Visual Gaussian policy (reference visual.py:274-352): camera
    features (trunk'd) ∥ fused pointcloud+state features → policy MLP,
    state-independent log-std. ``img=None`` path uses only the
    point-state encoder (encoder_type=None, visual.py:283-289)."""

    act_dim: int
    feature_dim: int = 1024
    hidden_dim: int = 512
    init_log_std: float = 0.0
    num_cams: int = 2
    encoder_type: str | None = "resnet"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.encoder_type == "resnet":
            self.encoder = ResEncoder(num_cams=self.num_cams, dtype=self.dtype)
        elif self.encoder_type == "dino":
            self.encoder = DINOEncoder(num_cams=self.num_cams, dtype=self.dtype)
        elif self.encoder_type is None:
            self.encoder = None
        else:
            raise ValueError(f"Invalid encoder type: {self.encoder_type}")
        self.point_state_encoder = Encoder(
            pointcloud_feature_dim=128, dtype=self.dtype
        )
        self.trunk_fc = TorchLinear(self.feature_dim, dtype=self.dtype)
        self.trunk_ln = nn.LayerNorm(dtype=self.dtype)
        self.pi_1 = TorchLinear(self.hidden_dim, dtype=self.dtype)
        self.pi_2 = TorchLinear(self.hidden_dim, dtype=self.dtype)
        self.pi_out = TorchLinear(self.act_dim, dtype=self.dtype)
        self.logstd = self.param(
            "logstd",
            lambda key, shape: jnp.full(shape, self.init_log_std, jnp.float32),
            (self.act_dim,),
        )

    def _features(self, img, state, pc, train: bool = False):
        h = self.point_state_encoder(state, pc)
        if self.encoder is not None and img is not None:
            x = self.encoder(img, train=train)
            x = nn.relu(self.trunk_ln(self.trunk_fc(x)))
            h = jnp.concatenate([x, h], axis=-1)
        return h

    def __call__(self, img, state, pc, train: bool = False):
        h = self._features(img, state, pc, train)
        h = nn.relu(self.pi_1(h))
        h = nn.relu(self.pi_2(h))
        mean = self.pi_out(h).astype(jnp.float32)
        return mean, jnp.broadcast_to(self.logstd, mean.shape)

    def sample(self, img, state, pc, rng, train: bool = False):
        mean, log_std = self(img, state, pc, train)
        action = D.diag_gaussian_sample(rng, mean, log_std)
        logp = D.diag_gaussian_logprob(action, mean, log_std)
        ent = D.diag_gaussian_entropy(log_std)
        return action, logp, ent

    def logprob_entropy(self, img, state, pc, actions, train: bool = False):
        mean, log_std = self(img, state, pc, train)
        return (
            D.diag_gaussian_logprob(actions, mean, log_std),
            D.diag_gaussian_entropy(log_std),
        )
