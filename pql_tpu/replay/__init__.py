"""Data layer: on-device circular replay + n-step staging.

TPU-native re-design of the reference replay (pql/replay/): storage lives
in HBM as jit-carried pytrees sharded on the env axis — no host round
trips, no Ray object-store shipping.
"""

from pql_tpu.replay.buffer import ReplayState, create_replay, replay_add, replay_sample, replay_slots
from pql_tpu.replay.nstep import NStepState, create_nstep, nstep_push, nstep_scan, nstep_return

__all__ = [
    "ReplayState",
    "create_replay",
    "replay_add",
    "replay_sample",
    "replay_slots",
    "NStepState",
    "create_nstep",
    "nstep_push",
    "nstep_scan",
    "nstep_return",
]
