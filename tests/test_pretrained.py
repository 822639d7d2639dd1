"""Local pretrained-weight merge (pql_tpu/models/pretrained.py) — the
air-gap analog of the reference's torchvision/torch-hub downloads
(reference pql/models/visual.py:183-210)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pql_tpu.models.pretrained import (
    load_weight_file,
    merge_pretrained,
    save_params_npz,
)


def _params():
    return {
        "params": {
            "trunk": {"conv1": {"kernel": jnp.zeros((3, 3, 4, 8)), "bias": jnp.zeros(8)}},
            "head": {"dense": {"kernel": jnp.zeros((16, 4))}},
        }
    }


class TestNpzRoundTrip:
    def test_save_then_merge_restores_everything(self, tmp_path):
        params = _params()
        src = {
            "params": {
                "trunk": {
                    "conv1": {
                        "kernel": jnp.arange(3 * 3 * 4 * 8, dtype=jnp.float32).reshape(3, 3, 4, 8),
                        "bias": jnp.ones(8),
                    }
                },
                "head": {"dense": {"kernel": jnp.full((16, 4), 2.0)}},
            }
        }
        path = str(tmp_path / "w.npz")
        save_params_npz(path, src)
        merged, report = merge_pretrained(params, path)
        assert not report["unmatched"] and not report["shape_mismatch"]
        assert len(report["loaded"]) == 3
        np.testing.assert_array_equal(
            np.asarray(merged["params"]["head"]["dense"]["kernel"]), 2.0 * np.ones((16, 4))
        )
        np.testing.assert_array_equal(
            np.asarray(merged["params"]["trunk"]["conv1"]["bias"]), np.ones(8)
        )

    def test_suffix_match_and_unmatched_report(self, tmp_path):
        path = str(tmp_path / "w.npz")
        np.savez(
            path,
            **{
                "dense/kernel": np.full((16, 4), 3.0, np.float32),  # suffix hit
                "nonexistent/layer": np.zeros(2, np.float32),  # no hit
            },
        )
        merged, report = merge_pretrained(_params(), path)
        assert report["unmatched"] == ["nonexistent/layer"]
        np.testing.assert_array_equal(
            np.asarray(merged["params"]["head"]["dense"]["kernel"]), 3.0 * np.ones((16, 4))
        )

    def test_shape_mismatch_reported_not_silent(self, tmp_path):
        path = str(tmp_path / "w.npz")
        np.savez(path, **{"conv1/bias": np.zeros(5, np.float32)})
        _, report = merge_pretrained(_params(), path)
        assert report["shape_mismatch"] and not report["loaded"]
        with pytest.raises(ValueError):
            merge_pretrained(_params(), path, require_all=True)


class TestTorchStateDict:
    def test_pth_linear_transposed_to_flax_layout(self, tmp_path):
        torch = pytest.importorskip("torch")
        path = str(tmp_path / "w.pth")
        # torch Linear stores [out, in] = [4, 16]; flax kernel is [16, 4]
        sd = {"head.dense.kernel": torch.arange(64, dtype=torch.float32).reshape(4, 16)}
        torch.save(sd, path)
        w = load_weight_file(path)
        assert w["head/dense/kernel"].shape == (4, 16)
        merged, report = merge_pretrained(_params(), path)
        assert report["loaded"] == ["params/head/dense/kernel"]
        np.testing.assert_array_equal(
            np.asarray(merged["params"]["head"]["dense"]["kernel"]),
            np.arange(64, dtype=np.float32).reshape(4, 16).T,
        )

    def test_rename_map(self, tmp_path):
        path = str(tmp_path / "w.npz")
        np.savez(path, **{"backbone.0.w": np.full((8,), 4.0, np.float32)})
        merged, report = merge_pretrained(
            _params(), path, rename={"backbone.0.w": "conv1/bias"}
        )
        assert report["loaded"] == ["params/trunk/conv1/bias"]
        np.testing.assert_array_equal(
            np.asarray(merged["params"]["trunk"]["conv1"]["bias"]), 4.0 * np.ones(8)
        )
