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
    rename: Callable[[str], str] | dict[str, str] | None = None,
    require_all: bool = False,
) -> tuple[Any, dict[str, list[str]]]:
    """Merge weights from ``path`` into ``params`` by path-suffix match.

    Returns (new_params, report) where report lists 'loaded', 'unmatched'
    (file keys that matched nothing) and 'shape_mismatch'. 2-D arrays are
    transposed when only the transpose fits (torch Linear layout).
    """
    file_weights = load_weight_file(path)
    if rename:
        ren = rename if callable(rename) else lambda k: rename.get(k, k)  # noqa: E731
        file_weights = {ren(k): v for k, v in file_weights.items()}

    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = [
        "/".join(str(getattr(p, "key", getattr(p, "name", getattr(p, "idx", p)))) for p in path_)
        for path_, _ in paths_leaves
    ]
    leaves = [leaf for _, leaf in paths_leaves]

    report = {"loaded": [], "unmatched": [], "shape_mismatch": []}
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
            else:
                report["shape_mismatch"].append(f"{fkey}: file {w.shape} vs param {leaf.shape}")
    if require_all and (report["unmatched"] or report["shape_mismatch"]):
        raise ValueError(f"Pretrained merge incomplete: {report}")
    return jax.tree_util.tree_unflatten(treedef, leaves), report
