"""Configuration tree for pql_tpu.

The reference uses hydra + omegaconf (reference scripts/train_pql.py:27,
pql/cfg/default.yaml:1-9). We provide the same composition UX — an
``algo`` group selected by name, dotted CLI overrides like
``algo.batch_size=8192 task=Cartpole`` — as plain Python dataclasses with
no external dependency.
"""

from pql_tpu.cfg.config import (
    Config,
    AlgoConfig,
    NoiseConfig,
    LoggingConfig,
    algo_config,
    make_config,
    parse_cli,
    to_dict,
)

__all__ = [
    "Config",
    "AlgoConfig",
    "NoiseConfig",
    "LoggingConfig",
    "algo_config",
    "make_config",
    "parse_cli",
    "to_dict",
]
