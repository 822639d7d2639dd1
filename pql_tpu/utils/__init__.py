"""Runtime services: trackers, logging, checkpointing, evaluation."""

from pql_tpu.utils.trackers import Tracker, EpisodeStats
from pql_tpu.utils.logging import RunLogger

__all__ = ["Tracker", "EpisodeStats", "RunLogger"]


def enable_compilation_cache(path: str | None = None, min_secs: float = 10.0) -> None:
    """Turn on JAX's persistent compilation cache (safe no-op on backends
    that can't serialize executables). The fused PQL step with the
    scalar-unrolled physics substep compiles in minutes the first time; a
    warm cache makes every later process start in seconds.

    The default cache dir is REPO-LOCAL (``<repo>/.xla_cache``) so one
    warmed run benefits every later process on the same machine (bench
    workers, the driver's dryrun). The dir is gitignored — cache entries
    are platform/compiler-version-keyed binaries that silently miss after
    any JAX/libtpu change, so they are never committed; re-warm with
    ``scripts/warm_bench_cache.py`` instead. Override the location with
    $PQL_TPU_CACHE_DIR (note the repo-root derivation assumes the package
    runs from a source checkout)."""
    import os

    import jax

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            path
            or os.environ.get("PQL_TPU_CACHE_DIR")
            or os.path.join(repo_root, ".xla_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", float(min_secs))
    except Exception:  # pragma: no cover - older jax without the knobs
        pass
