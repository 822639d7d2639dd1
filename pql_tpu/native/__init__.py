"""Native (C++) runtime components, bound via ctypes.

The reference gets its native performance from dependencies (Isaac Gym,
torch CUDA, Ray's C++ core — SURVEY §2); this package holds the
framework's own native pieces:

- ``host_ring`` — host-RAM replay ring with a threaded batch-gather
  (pql_tpu.native.host_replay.HostReplay), the analog of the reference's
  fp16-on-CPU ``reserve_space`` observation store
  (pql/replay/simple_replay.py:8-15).

Integration status: HostReplay is a TESTED, READY utility
(tests/test_native.py) that no training loop currently instantiates —
deliberately, and in exact parity with the reference, where
``reserve_space=True`` likewise has zero callers (no agent or script
passes it; verified 2026-08). The on-HBM sharded ring
(pql_tpu.replay.buffer) covers every live workload; HostReplay is the
escape hatch for a future off-policy VISION agent whose image replay
exceeds HBM — at which point the update loop samples host batches here
and device_puts them per critic step, exactly the reference's
cpu_indices → .to(device) path (simple_replay.py:85-104).

The shared library is compiled on first use from ``native/host_ring.cpp``
with the image's g++ and cached next to the source; no pip packages
involved (pybind11 is not available — plain C ABI + ctypes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_LIB_PATH = os.path.join(_SRC_DIR, "libhost_ring.so")
_lock = threading.Lock()
_lib = None


def _compile() -> None:
    src = os.path.join(_SRC_DIR, "host_ring.cpp")
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", src, "-o", _LIB_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load_host_ring() -> ctypes.CDLL:
    """Load (compiling if needed) the host_ring shared library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_SRC_DIR, "host_ring.cpp")
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
        ):
            _compile()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.host_ring_create.restype = ctypes.c_void_p
        lib.host_ring_create.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int
        ]
        lib.host_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.host_ring_ptr.restype = ctypes.c_int64
        lib.host_ring_ptr.argtypes = [ctypes.c_void_p]
        lib.host_ring_filled.restype = ctypes.c_int64
        lib.host_ring_filled.argtypes = [ctypes.c_void_p]
        lib.host_ring_write.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64
        ]
        lib.host_ring_gather.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_char_p,
        ]
        _lib = lib
        return lib


from pql_tpu.native.host_replay import HostReplay  # noqa: E402

__all__ = ["load_host_ring", "HostReplay"]
