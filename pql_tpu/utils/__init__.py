"""Runtime services: trackers, logging, checkpointing, evaluation."""

from pql_tpu.utils.trackers import Tracker, EpisodeStats
from pql_tpu.utils.logging import RunLogger

__all__ = ["Tracker", "EpisodeStats", "RunLogger"]


def enable_compilation_cache(path: str | None = None, min_secs: float = 10.0) -> None:
    """Turn on JAX's persistent compilation cache (safe no-op on backends
    that can't serialize executables). The fused PQL step with the
    scalar-unrolled physics substep compiles in minutes the first time; a
    warm cache makes every later process start in seconds."""
    import os

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            path or os.path.expanduser("~/.cache/pql_tpu/jax"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", float(min_secs))
    except Exception:  # pragma: no cover - older jax without the knobs
        pass
