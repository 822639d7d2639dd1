"""Local pretrained-weight loading for vision encoders.

The reference downloads torchvision ImageNet weights for ``ResEncoder``
and torch-hub DINOv2 weights for ``DINOEncoder`` at construction time
(reference pql/models/visual.py:183-210). A TPU pod is typically
air-gapped, so here pretrained weights come from a USER-SUPPLIED LOCAL
FILE instead (cfg ``algo.encoder_weights=/path``), in any of:

- ``.npz``  — flat mapping of '/'-joined param paths → arrays
  (the layout produced by :func:`save_params_npz`),
- an orbax checkpoint directory (a params pytree),
- ``.pth`` / ``.pt`` — a torch state_dict (torch-cpu is available);
  dot-joined keys are normalized to '/'-joined and 2-D weights are
  transposed from torch's [out, in] to the [in, out] kernel layout when
  that is what makes the shapes line up.

Merging is by path suffix with shape checking: a file key matches a
params leaf when the leaf's '/'-joined path ends with the key (so a
torchvision ``layer1.0.conv1.weight`` can target
``params/trunk/layer1_0/conv1/kernel`` via an explicit rename map the
caller provides, or identically-named Flax dumps merge directly).
Unmatched file keys are reported, never silently dropped.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import jax
import numpy as np


def _flatten(params: Any) -> dict[str, Any]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "name", getattr(p, "idx", p)))) for p in path
        )
        flat[key] = leaf
    return flat


def load_weight_file(path: str) -> dict[str, np.ndarray]:
    """Read a weight file into a flat {path: array} dict (see module doc)."""
    if os.path.isdir(path):  # orbax checkpoint dir
        from pql_tpu.utils.checkpoint import load_checkpoint

        return {k: np.asarray(v) for k, v in _flatten(load_checkpoint(path)).items()}
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    if path.endswith((".pth", ".pt")):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        sd = sd.get("state_dict", sd)
        return {k.replace(".", "/"): v.detach().numpy() for k, v in sd.items()}
    raise ValueError(f"Unsupported weight file: {path} (want .npz, .pth/.pt, or orbax dir)")


def save_params_npz(path: str, params: Any) -> None:
    """Dump a params pytree as a flat .npz loadable by load_weight_file."""
    np.savez(path, **{k: np.asarray(v) for k, v in _flatten(params).items()})


def merge_pretrained(
    params: Any,
    path: str,
    rename: Callable[[str], str | None] | dict[str, str] | None = None,
    require_all: bool = False,
) -> tuple[Any, dict[str, list[str]]]:
    """Merge weights from ``path`` into ``params`` by path-suffix match.

    Returns (new_params, report) where report lists 'loaded', 'unmatched'
    (file keys that matched nothing), 'skipped' (file keys the rename map
    deliberately dropped by returning None) and 'shape_mismatch'. Torch
    layouts are transposed when only the transpose fits: 2-D [out, in] →
    [in, out] (Linear) and 4-D [out, in, kh, kw] → [kh, kw, in, out]
    (Conv2d).
    """
    file_weights = load_weight_file(path)
    skipped: list[str] = []
    if rename:
        ren = rename if callable(rename) else lambda k: rename.get(k, k)  # noqa: E731
        renamed = {}
        for k, v in file_weights.items():
            new_k = ren(k)
            if new_k is None:
                skipped.append(k)
            else:
                renamed[new_k] = v
        file_weights = renamed

    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = [
        "/".join(str(getattr(p, "key", getattr(p, "name", getattr(p, "idx", p)))) for p in path_)
        for path_, _ in paths_leaves
    ]
    leaves = [leaf for _, leaf in paths_leaves]

    report = {"loaded": [], "unmatched": [], "skipped": skipped, "shape_mismatch": []}
    for fkey, w in file_weights.items():
        hits = [i for i, k in enumerate(keys) if k == fkey or k.endswith("/" + fkey)]
        if not hits:
            report["unmatched"].append(fkey)
            continue
        for i in hits:
            leaf = leaves[i]
            if w.shape == leaf.shape:
                leaves[i] = w.astype(leaf.dtype)
                report["loaded"].append(keys[i])
            elif w.ndim == 2 and w.T.shape == leaf.shape:
                leaves[i] = w.T.astype(leaf.dtype)  # torch [out,in] → [in,out]
                report["loaded"].append(keys[i])
            elif w.ndim == 4 and w.transpose(2, 3, 1, 0).shape == leaf.shape:
                # torch Conv2d [out,in,kh,kw] → flax [kh,kw,in,out]
                leaves[i] = w.transpose(2, 3, 1, 0).astype(leaf.dtype)
                report["loaded"].append(keys[i])
            else:
                report["shape_mismatch"].append(f"{fkey}: file {w.shape} vs param {leaf.shape}")
    if require_all and (report["unmatched"] or report["shape_mismatch"]):
        raise ValueError(f"Pretrained merge incomplete: {report}")
    return jax.tree_util.tree_unflatten(treedef, leaves), report


# ---------------------------------------------------------------------------
# committed rename maps for the weight layouts the reference downloads
# ---------------------------------------------------------------------------

_TV_BLOCKS = {  # torchvision (layer, block) → flax auto-name in ResNet18Trunk
    ("layer1", "0"): "_BasicBlock_0",
    ("layer1", "1"): "_BasicBlock_1",
    ("layer2", "0"): "_BasicBlock_2",
    ("layer2", "1"): "_BasicBlock_3",
}


def torchvision_resnet18_rename(key: str) -> str | None:
    """Rename a torchvision ``resnet18().state_dict()`` key ('/'-joined by
    :func:`load_weight_file`) onto :class:`~pql_tpu.models.visual.ResNet18Trunk`
    param paths, or None for keys that have no TPU-side analog.

    The reference cuts the torchvision model after ``layer2``
    (reference pql/models/visual.py:245-248) — ``layer3``/``layer4``/``fc``
    are dropped here for the same reason. BatchNorm affine (weight/bias)
    lands on the corresponding GroupNorm's scale/bias (shape-identical;
    the trunk fine-tunes from there), while BN *running statistics* have
    no GroupNorm analog and are skipped. Conv kernels are relaid
    [out,in,kh,kw] → [kh,kw,in,out] by :func:`merge_pretrained`.
    """
    parts = key.split("/")
    leaf = parts[-1]
    if parts[0] in ("layer3", "layer4", "fc"):
        return None
    if leaf in ("running_mean", "running_var", "num_batches_tracked"):
        return None
    affine = {"weight": "scale", "bias": "bias"}
    if parts[0] == "conv1":
        return "ResNet18Trunk_0/Conv_0/kernel"
    if parts[0] == "bn1":
        return f"ResNet18Trunk_0/GroupNorm_0/{affine[leaf]}"
    block = _TV_BLOCKS.get((parts[0], parts[1]) if len(parts) > 1 else None)
    if block is not None:
        sub = parts[2]
        if sub.startswith("conv"):
            return f"ResNet18Trunk_0/{block}/Conv_{int(sub[4:]) - 1}/kernel"
        if sub.startswith("bn"):
            return f"ResNet18Trunk_0/{block}/GroupNorm_{int(sub[2:]) - 1}/{affine[leaf]}"
        if sub == "downsample":  # 0 = 1×1 conv, 1 = its norm
            if parts[3] == "0":
                return f"ResNet18Trunk_0/{block}/Conv_2/kernel"
            return f"ResNet18Trunk_0/{block}/GroupNorm_2/{affine[leaf]}"
    return None
