"""Unit tests for pql_tpu.ops: normalizer, noise, schedules, C51 projection.

Golden references are independent numpy implementations of the reference
semantics (pql/utils/torch_util.py, noise.py, distl_util.py,
schedule_util.py) — not ports of the torch code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pql_tpu.ops import (
    RunningMeanStd,
    add_mixed_normal_noise,
    categorical_projection,
    mixed_noise_std,
    soft_update,
)
from pql_tpu.ops.distributional import dist_to_q, support_atoms
from pql_tpu.ops.schedules import ExponentialSchedule, LinearSchedule


class TestRunningMeanStd:
    def test_matches_two_pass_stats(self, rng):
        rms = RunningMeanStd.create((5,))
        chunks = [jax.random.normal(jax.random.fold_in(rng, i), (64, 5)) * (i + 1) + i for i in range(6)]
        for c in chunks:
            rms = rms.update(c)
        full = np.concatenate([np.asarray(c) for c in chunks])
        np.testing.assert_allclose(np.asarray(rms.mean), full.mean(0), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(rms.var), full.var(0, ddof=1), rtol=2e-2)

    def test_normalize_roundtrip(self, rng):
        rms = RunningMeanStd.create((3,))
        x = jax.random.normal(rng, (128, 3)) * 4 + 7
        rms = rms.update(x)
        y = rms.normalize(x)
        np.testing.assert_allclose(np.asarray(rms.unnormalize(y)), np.asarray(x), atol=1e-4)
        assert float(jnp.abs(jnp.mean(y))) < 0.1

    def test_clip(self, rng):
        rms = RunningMeanStd.create((2,))
        rms = rms.update(jax.random.normal(rng, (100, 2)))
        out = rms.normalize_clip(jnp.full((4, 2), 1e6))
        assert float(jnp.max(out)) <= 5.0

    def test_sharded_update_matches_global(self, rng):
        """psum-merged moments on 8 shards == single-device update."""
        from jax.sharding import Mesh, PartitionSpec as P
        from jax import shard_map

        devices = np.array(jax.devices()[:8])
        mesh = Mesh(devices, ("env",))
        x = jax.random.normal(rng, (64, 3)) * 2 + 5
        rms0 = RunningMeanStd.create((3,))

        def body(rms, xs):
            return rms.update_sharded(xs, "env")

        sharded = shard_map(
            body, mesh=mesh, in_specs=(P(), P("env")), out_specs=P(), check_vma=False
        )(rms0, x)
        ref = rms0.update(x)
        np.testing.assert_allclose(np.asarray(sharded.mean), np.asarray(ref.mean), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sharded.var), np.asarray(ref.var), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sharded.count), np.asarray(ref.count))


class TestNoise:
    def test_mixed_std_ladder_matches_linspace(self):
        std = mixed_noise_std(16, 0.05, 0.8)
        np.testing.assert_allclose(np.asarray(std), np.linspace(0.05, 0.8, 16), rtol=1e-6)

    def test_shard_slices_cover_global_ladder(self):
        full = mixed_noise_std(32, 0.05, 0.8)
        parts = [mixed_noise_std(32, 0.05, 0.8, global_start=s, num_local=8) for s in (0, 8, 16, 24)]
        np.testing.assert_allclose(np.concatenate([np.asarray(p) for p in parts]), np.asarray(full), rtol=1e-6)

    def test_mixed_noise_bounds_and_spread(self, rng):
        x = jnp.zeros((1024, 4))
        out = add_mixed_normal_noise(rng, x, 0.05, 0.8, out_bounds=(-1.0, 1.0))
        assert float(jnp.max(jnp.abs(out))) <= 1.0
        # low-index envs get small noise, high-index large
        lo = float(jnp.std(out[:64]))
        hi = float(jnp.std(out[-64:]))
        assert lo < 0.15 and hi > 0.3


class TestSchedules:
    def test_linear(self):
        s = LinearSchedule(0.8, 0.05, 100)
        assert float(s(0)) == pytest.approx(0.8)
        assert float(s(50)) == pytest.approx(0.425)
        assert float(s(100)) == pytest.approx(0.05)
        assert float(s(500)) == pytest.approx(0.05)

    def test_exponential_floors_at_end_val(self):
        s = ExponentialSchedule(0.8, 0.9, 0.05)
        assert float(s(0)) == pytest.approx(0.8)
        assert float(s(1000)) == pytest.approx(0.05)


def _reference_projection(next_dist, reward, done, gamma, v_min, v_max, num_atoms):
    """Independent numpy transcription of the C51 scatter algorithm
    (reference distl_util.py:4-20) used as golden values."""
    delta_z = (v_max - v_min) / (num_atoms - 1)
    support = np.linspace(v_min, v_max, num_atoms)
    B = reward.shape[0]
    target_z = np.clip(reward + (1 - done) * gamma * support[None, :], v_min, v_max)
    b = (target_z - v_min) / delta_z
    l = np.floor(b).astype(int)
    u = np.ceil(b).astype(int)
    l[np.logical_and(u > 0, l == u)] -= 1
    u[np.logical_and(l < (num_atoms - 1), l == u)] += 1
    proj = np.zeros_like(next_dist)
    for i in range(B):
        for j in range(num_atoms):
            proj[i, l[i, j]] += next_dist[i, j] * (u[i, j] - b[i, j])
            proj[i, u[i, j]] += next_dist[i, j] * (b[i, j] - l[i, j])
    return proj


class TestCategoricalProjection:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_scatter_reference(self, seed):
        rs = np.random.RandomState(seed)
        B, A = 32, 51
        logits = rs.randn(B, A)
        dist = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
        reward = rs.randn(B, 1) * 3
        done = (rs.rand(B, 1) < 0.3).astype(np.float32)
        ours = categorical_projection(
            jnp.asarray(dist, jnp.float32), jnp.asarray(reward, jnp.float32),
            jnp.asarray(done, jnp.float32), gamma=0.97, v_min=-10, v_max=10,
        )
        ref = _reference_projection(dist, reward, done, 0.97, -10, 10, A)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_mass_conserved(self, rng):
        dist = jax.nn.softmax(jax.random.normal(rng, (64, 51)), axis=-1)
        reward = jax.random.normal(jax.random.fold_in(rng, 1), (64, 1)) * 20  # force clipping
        done = jnp.zeros((64, 1))
        proj = categorical_projection(dist, reward, done, 0.99)
        np.testing.assert_allclose(np.asarray(proj.sum(-1)), np.ones(64), atol=1e-5)

    def test_done_collapses_to_reward_atom(self):
        dist = jnp.full((1, 51), 1.0 / 51)
        reward = jnp.array([[0.0]])
        done = jnp.ones((1, 1))
        proj = categorical_projection(dist, reward, done, 0.99)
        # all mass on the atom at z=0 (index 25 of linspace(-10,10,51))
        assert float(proj[0, 25]) == pytest.approx(1.0, abs=1e-5)

    def test_dist_to_q(self):
        z = support_atoms(-10, 10, 51)
        onehot = jnp.zeros((1, 51)).at[0, 30].set(1.0)
        assert float(dist_to_q(onehot, -10, 10)[0]) == pytest.approx(float(z[30]))


class TestSoftUpdate:
    def test_polyak(self):
        tgt = {"w": jnp.zeros(3), "b": jnp.ones(2)}
        src = {"w": jnp.ones(3), "b": jnp.zeros(2)}
        out = soft_update(tgt, src, 0.05)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.05)
        np.testing.assert_allclose(np.asarray(out["b"]), 0.95)


class TestPallasProjection:
    """Pallas C51 projection kernel vs the dense formulation (and thereby
    vs the reference scatter semantics, distl_util.py:4-20)."""

    def test_matches_dense(self, rng):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from pql_tpu.ops.distributional import categorical_projection
        from pql_tpu.ops.pallas import categorical_projection_pallas

        B, A = 300, 51  # non-multiple of the tile to exercise padding
        k1, k2, k3 = jax.random.split(rng, 3)
        p = jax.nn.softmax(jax.random.normal(k1, (B, A)), -1)
        rew = 3.0 * jax.random.normal(k2, (B, 1))
        done = (jax.random.uniform(k3, (B, 1)) < 0.3).astype(jnp.float32)
        o1 = categorical_projection(p, rew, done, 0.95)
        o2 = categorical_projection_pallas(p, rew, done, 0.95, tile=128)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

    def test_mass_conserved(self, rng):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from pql_tpu.ops.pallas import categorical_projection_pallas

        p = jax.nn.softmax(jax.random.normal(rng, (64, 51)), -1)
        out = categorical_projection_pallas(
            p, jnp.zeros((64, 1)), jnp.zeros((64, 1)), 0.99
        )
        np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)

    def test_td_target_min(self, rng):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from pql_tpu.ops.distributional import categorical_td_target
        from pql_tpu.ops.pallas import categorical_td_target_pallas

        k1, k2 = jax.random.split(rng)
        p1 = jax.nn.softmax(jax.random.normal(k1, (32, 51)), -1)
        p2 = jax.nn.softmax(jax.random.normal(k2, (32, 51)), -1)
        rew = jnp.ones((32, 1))
        done = jnp.zeros((32, 1))
        o1 = categorical_td_target(p1, p2, rew, done, 0.97, -10.0, 10.0)
        o2 = categorical_td_target_pallas(p1, p2, rew, done, 0.97, -10.0, 10.0)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
