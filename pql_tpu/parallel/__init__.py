"""Device mesh construction, sharding rules, and multi-host init."""

from pql_tpu.parallel.distributed import host_barrier, initialize, is_primary, replicate
from pql_tpu.parallel.mesh import make_mesh, state_pspecs, state_shardings

__all__ = [
    "host_barrier",
    "initialize",
    "is_primary",
    "make_mesh",
    "replicate",
    "state_pspecs",
    "state_shardings",
]
