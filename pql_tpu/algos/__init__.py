"""Algorithm registry (reference pql/algo/__init__.py:1-6 discovers
Agent classes by AST scan; here it's an explicit map keyed by
cfg.algo.name)."""

from pql_tpu.algos.ddpg import DDPG, OffPolicyState
from pql_tpu.algos.sac import SAC, SACState
from pql_tpu.algos.crossq import CrossQ, CrossQState
from pql_tpu.algos.ppo import PPO, PPOState
from pql_tpu.algos.pql import PQL, PQLState
from pql_tpu.algos.ippo import IPPO, IPPOState
from pql_tpu.algos.mappo import MAPPO, MAPPOState
from pql_tpu.algos.iddpg import IDDPG, IDDPGState

ALGO_REGISTRY = {
    "PQL": PQL,
    "DDPG": DDPG,
    "SAC": SAC,
    "CrossQ": CrossQ,
    "PPO": PPO,
    "IPPO": IPPO,
    "MAPPO": MAPPO,
    "IDDPG": IDDPG,
}


def register_algo(name: str, cls) -> None:
    ALGO_REGISTRY[name] = cls


def get_algo(name: str):
    if name not in ALGO_REGISTRY:
        raise KeyError(f"Unknown algo '{name}'. Available: {sorted(ALGO_REGISTRY)}")
    return ALGO_REGISTRY[name]


__all__ = [
    "ALGO_REGISTRY",
    "register_algo",
    "get_algo",
    "DDPG",
    "SAC",
    "CrossQ",
    "PPO",
    "PQL",
    "IPPO",
    "MAPPO",
    "IDDPG",
    "OffPolicyState",
    "SACState",
    "CrossQState",
    "PPOState",
    "PQLState",
    "IPPOState",
    "MAPPOState",
    "IDDPGState",
]
