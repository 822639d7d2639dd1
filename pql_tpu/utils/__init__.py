"""Runtime services: trackers, logging, checkpointing, evaluation."""

from pql_tpu.utils.trackers import Tracker, EpisodeStats
from pql_tpu.utils.logging import RunLogger

__all__ = ["Tracker", "EpisodeStats", "RunLogger"]
