"""Host-memory replay buffer over the native ring (vision-scale storage).

Mirrors the flat GPU ReplayBuffer semantics (reference
pql/replay/simple_replay.py:21-104) but keeps the heavy fields (obs /
next_obs, optionally images) in HOST RAM as fp16/uint8 — the reference's
``reserve_space`` design (simple_replay.py:8-15) — while the device-side
training step receives only the sampled batch. Writes and the random
batch gather run in the C++ ring (multi-threaded memcpy), so the Python
side only moves one contiguous [batch, dim] block per update.

Device transfer happens once per sampled batch via jax.device_put — the
same host→device traffic the reference pays when sampling CPU-stored
observations onto the GPU.
"""

from __future__ import annotations

import ctypes

import numpy as np


class HostReplay:
    """Ring over named fields; all fields share (slots, num_envs)."""

    def __init__(
        self,
        slots: int,
        num_envs: int,
        field_dims: dict[str, int],
        dtypes: dict[str, np.dtype] | None = None,
        threads: int = 0,
    ):
        from pql_tpu.native import load_host_ring

        self._lib = load_host_ring()
        self.slots = int(slots)
        self.num_envs = int(num_envs)
        self.fields = dict(field_dims)
        self.dtypes = {
            k: np.dtype((dtypes or {}).get(k, np.float16)) for k in field_dims
        }
        self._rings = {}
        for k, dim in field_dims.items():
            row_bytes = int(dim) * self.dtypes[k].itemsize
            h = self._lib.host_ring_create(self.slots, self.num_envs, row_bytes, threads)
            if not h:
                raise MemoryError(f"host_ring_create failed for field '{k}'")
            self._rings[k] = ctypes.c_void_p(h)
        self._rng = np.random.default_rng(0)

    def __del__(self):
        for h in getattr(self, "_rings", {}).values():
            try:
                self._lib.host_ring_destroy(h)
            except Exception:
                pass

    @property
    def filled(self) -> int:
        k = next(iter(self._rings))
        return int(self._lib.host_ring_filled(self._rings[k]))

    def add(self, rows: dict[str, np.ndarray]) -> None:
        """Write a [T, E, dim] chunk per field (ring-wrapped in C++)."""
        for k, v in rows.items():
            v = np.ascontiguousarray(np.asarray(v), dtype=self.dtypes[k])
            t = v.shape[0]
            assert v.shape[1] == self.num_envs, (k, v.shape)
            self._lib.host_ring_write(
                self._rings[k], v.ctypes.data_as(ctypes.c_char_p), t
            )

    def sample(self, batch_size: int, fields: tuple[str, ...] | None = None,
               seed: int | None = None) -> dict[str, np.ndarray]:
        """Uniform (slot, env) sample gathered by the native thread pool."""
        if seed is not None:
            self._rng = np.random.default_rng(seed)
        filled = max(self.filled, 1)
        slot_idx = self._rng.integers(0, filled, batch_size, dtype=np.int64)
        env_idx = self._rng.integers(0, self.num_envs, batch_size, dtype=np.int64)
        sp = slot_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        ep = env_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        out = {}
        for k in fields or self.fields:
            dim = self.fields[k]
            buf = np.empty((batch_size, dim), dtype=self.dtypes[k])
            self._lib.host_ring_gather(
                self._rings[k], sp, ep, batch_size,
                buf.ctypes.data_as(ctypes.c_char_p),
            )
            out[k] = buf
        return out
