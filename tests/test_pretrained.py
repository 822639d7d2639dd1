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


class TestTorchvisionResNet18Layout:
    """The reference's actual capability: torchvision resnet18 ImageNet
    weights feeding ResEncoder's trunk (reference pql/models/visual.py:210,
    cut at 'layer2' per visual.py:245-248). Fixture: a state_dict with the
    REAL torchvision key names and shapes (synthetic values), saved via
    torch.save, merged through the committed rename map."""

    @staticmethod
    def _torchvision_state_dict(torch):
        g = torch.Generator().manual_seed(0)
        sd = {}

        def conv(name, cout, cin, k):
            sd[name] = torch.randn(cout, cin, k, k, generator=g)

        def bn(name, c):
            sd[f"{name}.weight"] = torch.randn(c, generator=g)
            sd[f"{name}.bias"] = torch.randn(c, generator=g)
            sd[f"{name}.running_mean"] = torch.zeros(c)
            sd[f"{name}.running_var"] = torch.ones(c)
            sd[f"{name}.num_batches_tracked"] = torch.tensor(0)

        conv("conv1.weight", 64, 3, 7)
        bn("bn1", 64)
        for layer, blocks, cin, cout in (("layer1", 2, 64, 64), ("layer2", 2, 64, 128)):
            for b in range(blocks):
                first_in = cin if b == 0 else cout
                conv(f"{layer}.{b}.conv1.weight", cout, first_in, 3)
                bn(f"{layer}.{b}.bn1", cout)
                conv(f"{layer}.{b}.conv2.weight", cout, cout, 3)
                bn(f"{layer}.{b}.bn2", cout)
                if layer == "layer2" and b == 0:  # stride-2 downsample
                    conv(f"{layer}.{b}.downsample.0.weight", cout, cin, 1)
                    bn(f"{layer}.{b}.downsample.1", cout)
        # parts the reference cuts away (visual.py:245-248) — must be skipped
        conv("layer3.0.conv1.weight", 256, 128, 3)
        sd["fc.weight"] = torch.randn(1000, 512, generator=g)
        sd["fc.bias"] = torch.randn(1000, generator=g)
        return sd

    def test_merge_into_resencoder(self, tmp_path):
        torch = pytest.importorskip("torch")
        import jax

        from pql_tpu.models.pretrained import torchvision_resnet18_rename
        from pql_tpu.models.visual import ResEncoder

        sd = self._torchvision_state_dict(torch)
        path = str(tmp_path / "resnet18.pth")
        torch.save(sd, path)

        enc = ResEncoder(repr_dim=32, num_cams=1)
        obs = jnp.zeros((1, 1, 2, 64, 64, 3))
        params = enc.init(jax.random.PRNGKey(0), obs)

        merged, report = merge_pretrained(
            params, path, rename=torchvision_resnet18_rename, require_all=True
        )
        # 10 conv kernels + 10 GroupNorm scale/bias pairs land in the trunk
        assert len(report["loaded"]) == 10 + 20
        assert not report["unmatched"] and not report["shape_mismatch"]
        # BN running stats, layer3+, and fc are deliberately skipped
        assert "bn1/running_mean" in report["skipped"]
        assert "layer3/0/conv1/weight" in report["skipped"]
        assert "fc/weight" in report["skipped"]

        # conv kernels arrive in flax [kh, kw, in, out] layout
        stem = np.asarray(merged["params"]["ResNet18Trunk_0"]["Conv_0"]["kernel"])
        np.testing.assert_array_equal(
            stem, sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
        )
        assert stem.shape == (7, 7, 3, 64)
        ds = np.asarray(
            merged["params"]["ResNet18Trunk_0"]["_BasicBlock_2"]["Conv_2"]["kernel"]
        )
        np.testing.assert_array_equal(
            ds, sd["layer2.0.downsample.0.weight"].numpy().transpose(2, 3, 1, 0)
        )
        # BN affine → GroupNorm affine (shape-identical; trunk fine-tunes)
        np.testing.assert_array_equal(
            np.asarray(merged["params"]["ResNet18Trunk_0"]["GroupNorm_0"]["scale"]),
            sd["bn1.weight"].numpy(),
        )
        # the merged encoder still runs forward
        out = enc.apply(merged, obs)
        assert out.shape == (1, 32)
