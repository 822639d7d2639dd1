"""Tests for the ring replay buffer and n-step staging.

Golden n-step values come from an independent per-env python loop
implementing the window semantics of reference nstep_replay.py:74-92.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pql_tpu.replay import (
    create_nstep,
    create_replay,
    nstep_push,
    nstep_scan,
    replay_add,
    replay_sample,
)


class TestReplayRing:
    def test_write_then_read(self, rng):
        buf = create_replay(slots=8, num_envs=4, obs_dim=3, action_dim=2)
        rows = {
            "obs": jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3),
            "action": jnp.ones((2, 4, 2)),
            "reward": jnp.ones((2, 4, 1)),
            "next_obs": jnp.zeros((2, 4, 3)),
            "done": jnp.zeros((2, 4, 1)),
        }
        buf = replay_add(buf, rows)
        assert int(buf.ptr) == 2
        assert int(buf.filled) == 2
        np.testing.assert_allclose(np.asarray(buf.field("obs")[:2]), np.asarray(rows["obs"]))

    def test_wraparound(self):
        buf = create_replay(slots=4, num_envs=2, obs_dim=1, action_dim=1)
        for i in range(6):  # 6 single-slot writes into 4 slots
            rows = {
                "obs": jnp.full((1, 2, 1), float(i)),
                "action": jnp.zeros((1, 2, 1)),
                "reward": jnp.zeros((1, 2, 1)),
                "next_obs": jnp.zeros((1, 2, 1)),
                "done": jnp.zeros((1, 2, 1)),
            }
            buf = replay_add(buf, rows)
        assert int(buf.ptr) == 2
        assert int(buf.filled) == 4
        # ring holds [4, 5, 2, 3]
        np.testing.assert_allclose(
            np.asarray(buf.field("obs")[:, 0, 0]), np.array([4.0, 5.0, 2.0, 3.0])
        )

    def test_valid_start_excludes_garbage_prefix(self, rng):
        buf = create_replay(slots=16, num_envs=2, obs_dim=1, action_dim=1, valid_start=2)
        # write 6 slots; first 2 are "garbage" (nstep warmup)
        marker = jnp.arange(6, dtype=jnp.float32).reshape(6, 1, 1)
        rows = {
            "obs": jnp.broadcast_to(marker, (6, 2, 1)),
            "action": jnp.zeros((6, 2, 1)),
            "reward": jnp.zeros((6, 2, 1)),
            "next_obs": jnp.zeros((6, 2, 1)),
            "done": jnp.zeros((6, 2, 1)),
        }
        buf = replay_add(buf, rows)
        assert int(buf.valid_start) == 2
        batch = replay_sample(buf, rng, 256)
        assert float(jnp.min(batch["obs"])) >= 2.0  # garbage slots 0,1 never sampled

        # after wrap, everything is valid
        for _ in range(3):
            buf = replay_add(buf, rows)
        assert int(buf.valid_start) == 0

    def test_sample_uniform_over_filled(self, rng):
        buf = create_replay(slots=8, num_envs=4, obs_dim=1, action_dim=1)
        marker = jnp.arange(5, dtype=jnp.float32).reshape(5, 1, 1)
        rows = {
            "obs": jnp.broadcast_to(marker, (5, 4, 1)),
            "action": jnp.zeros((5, 4, 1)),
            "reward": jnp.zeros((5, 4, 1)),
            "next_obs": jnp.zeros((5, 4, 1)),
            "done": jnp.zeros((5, 4, 1)),
        }
        buf = replay_add(buf, rows)
        batch = replay_sample(buf, rng, 4096)
        vals = np.asarray(batch["obs"][:, 0])
        assert vals.min() >= 0 and vals.max() <= 4  # only filled slots
        counts = np.bincount(vals.astype(int), minlength=5)
        assert counts.min() > 4096 / 5 * 0.7  # roughly uniform

    def test_bf16_storage_roundtrip(self, rng):
        buf = create_replay(slots=4, num_envs=2, obs_dim=3, action_dim=1, obs_dtype=jnp.bfloat16)
        rows = {
            "obs": jax.random.normal(rng, (1, 2, 3)),
            "action": jnp.zeros((1, 2, 1)),
            "reward": jnp.zeros((1, 2, 1)),
            "next_obs": jnp.zeros((1, 2, 3)),
            "done": jnp.zeros((1, 2, 1)),
        }
        buf = replay_add(buf, rows)
        batch = replay_sample(buf, rng, 8)
        assert batch["obs"].dtype == jnp.float32  # upcast on read


def _naive_nstep(window, gamma):
    """Per-env python reference of the n-step reduction: window is a list of
    (r, next_obs, done) oldest-first."""
    n = len(window)
    k = next((i for i, (_, _, d) in enumerate(window) if d), n - 1)
    reward = sum(gamma**i * window[i][0] for i in range(k + 1))
    next_obs = window[k][1]
    done = any(d for (_, _, d) in window)
    return reward, next_obs, done


class TestNStep:
    def test_matches_naive_reference(self, rng):
        n, E, T = 3, 5, 12
        gamma = 0.99
        rs = np.random.RandomState(0)
        rewards = rs.randn(T, E).astype(np.float32)
        dones = (rs.rand(T, E) < 0.25).astype(np.float32)
        obs = rs.randn(T, E, 2).astype(np.float32)
        next_obs = rs.randn(T, E, 2).astype(np.float32)
        actions = rs.randn(T, E, 1).astype(np.float32)

        st = create_nstep(E, 2, 1, nstep=n, gamma=gamma)
        traj = {
            "obs": jnp.asarray(obs),
            "action": jnp.asarray(actions),
            "reward": jnp.asarray(rewards)[..., None],
            "next_obs": jnp.asarray(next_obs),
            "done": jnp.asarray(dones)[..., None],
        }
        st, outs, valids = nstep_scan(st, traj)

        assert not bool(valids[0]) and not bool(valids[1])
        assert bool(valids[2]) and bool(valids[-1])

        for t in range(n - 1, T):
            for e in range(E):
                window = [
                    (rewards[t - n + 1 + i, e], next_obs[t - n + 1 + i, e], dones[t - n + 1 + i, e] > 0.5)
                    for i in range(n)
                ]
                r_ref, no_ref, d_ref = _naive_nstep(window, gamma)
                assert float(outs["reward"][t, e, 0]) == np.float32(r_ref) or abs(
                    float(outs["reward"][t, e, 0]) - r_ref
                ) < 1e-4
                np.testing.assert_allclose(np.asarray(outs["next_obs"][t, e]), no_ref, atol=1e-6)
                assert bool(outs["done"][t, e, 0] > 0.5) == d_ref
                # obs/action come from the oldest window entry
                np.testing.assert_allclose(np.asarray(outs["obs"][t, e]), obs[t - n + 1, e], atol=1e-6)

    def test_nstep1_passthrough(self):
        st = create_nstep(3, 2, 1, nstep=1, gamma=0.9)
        st, out, valid = nstep_push(
            st,
            jnp.ones((3, 2)),
            jnp.zeros((3, 1)),
            jnp.full((3,), 2.0),
            jnp.ones((3, 2)) * 5,
            jnp.zeros((3,)),
        )
        assert bool(valid)
        np.testing.assert_allclose(np.asarray(out["reward"]), 2.0)

    def test_fifo_persists_across_scans(self, rng):
        """Reference keeps the FIFO across explore calls (nstep_replay.py:22)."""
        E, n = 2, 3
        st = create_nstep(E, 1, 1, nstep=n, gamma=1.0)
        traj1 = {
            "obs": jnp.ones((2, E, 1)),
            "action": jnp.zeros((2, E, 1)),
            "reward": jnp.ones((2, E, 1)),
            "next_obs": jnp.ones((2, E, 1)),
            "done": jnp.zeros((2, E, 1)),
        }
        st, outs, valids = nstep_scan(st, traj1)
        assert not bool(valids.any())  # only 2 pushes so far
        st, outs, valids = nstep_scan(st, traj1)
        assert bool(valids.all())  # pushes 3 and 4 both emit
        # gamma=1, no dones: reward = 3 (sum of window)
        np.testing.assert_allclose(np.asarray(outs["reward"]), 3.0)


class TestStratifiedSampling:
    def test_shapes_and_validity(self, rng):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from pql_tpu.replay import create_replay, replay_add, replay_sample

        r = create_replay(slots=16, num_envs=8, obs_dim=3, action_dim=2)
        chunk = {
            "obs": jnp.arange(16 * 8 * 3, dtype=jnp.float32).reshape(16, 8, 3),
            "action": jnp.zeros((16, 8, 2)),
            "reward": jnp.ones((16, 8, 1)),
            "next_obs": jnp.zeros((16, 8, 3)),
            "done": jnp.zeros((16, 8, 1)),
        }
        r = replay_add(r, chunk)
        batch = replay_sample(r, rng, 32, sample_slots=4)
        assert batch["obs"].shape == (32, 3)
        # every sampled obs row must be one of the written rows
        written = np.asarray(chunk["obs"]).reshape(-1, 3)
        for row in np.asarray(batch["obs"]):
            assert any(np.array_equal(row, w) for w in written)

    def test_uniform_marginals(self, rng):
        """Slot-stratified sampling keeps uniform (slot, env) marginals."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from pql_tpu.replay import create_replay, replay_add, replay_sample

        S, E = 8, 4
        r = create_replay(slots=S, num_envs=E, obs_dim=1, action_dim=1)
        ids = jnp.arange(S * E, dtype=jnp.float32).reshape(S, E, 1)
        r = replay_add(r, {
            "obs": ids, "action": jnp.zeros((S, E, 1)),
            "reward": jnp.zeros((S, E, 1)), "next_obs": jnp.zeros((S, E, 1)),
            "done": jnp.zeros((S, E, 1)),
        })
        counts = np.zeros(S * E)
        for i in range(400):
            b = replay_sample(r, jax.random.PRNGKey(i), 8, sample_slots=2)
            for v in np.asarray(b["obs"][:, 0]).astype(int):
                counts[v] += 1
        freq = counts / counts.sum()
        # each of the 32 cells should be ~1/32 (loose 3x bound)
        assert freq.max() < 3.0 / (S * E) and freq.min() > 1.0 / (3 * S * E)

    def test_fallback_when_not_divisible(self, rng):
        from pql_tpu.replay import create_replay, replay_sample
        import jax.numpy as jnp

        r = create_replay(slots=4, num_envs=4, obs_dim=2, action_dim=1)
        # batch 10 not divisible by 4 slots -> falls back to independent pairs
        b = replay_sample(r, rng, 10, sample_slots=4)
        assert b["obs"].shape == (10, 2)


class TestLanePadding:
    """Narrow packed rows are zero-padded to 64 columns (round-5 headline
    fix: D=11 rows made every TPU ring write/gather pad — +45% measured);
    rows >= 64 must stay byte-identical."""

    def test_narrow_rows_padded_fields_unchanged(self):
        import jax
        import jax.numpy as jnp

        from pql_tpu.replay import create_replay, replay_add, replay_sample

        r = create_replay(slots=4, num_envs=2, obs_dim=4, action_dim=1)
        assert r.data.shape[-1] == 64  # 4+1+1+4+1=11 -> padded
        rows = dict(
            obs=jnp.ones((1, 2, 4)),
            action=jnp.full((1, 2, 1), 2.0),
            reward=jnp.full((1, 2), 3.0),
            next_obs=jnp.full((1, 2, 4), 4.0),
            done=jnp.zeros((1, 2)),
        )
        r = replay_add(r, rows)
        batch = replay_sample(r, jax.random.PRNGKey(0), 8)
        assert batch["obs"].shape == (8, 4)
        assert float(batch["action"].min()) == 2.0
        assert float(batch["next_obs"].max()) == 4.0
        # padding columns are zeros, never surfaced through field views
        assert float(jnp.abs(r.data[..., 11:]).max()) == 0.0

    def test_wide_rows_not_padded(self):
        from pql_tpu.replay import create_replay

        r = create_replay(slots=4, num_envs=2, obs_dim=34, action_dim=8)
        assert r.data.shape[-1] == 34 + 8 + 1 + 34 + 1  # 78, untouched
