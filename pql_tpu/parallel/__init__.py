"""Device mesh construction and sharding rules."""

from pql_tpu.parallel.mesh import make_mesh, state_pspecs, state_shardings

__all__ = ["make_mesh", "state_pspecs", "state_shardings"]
