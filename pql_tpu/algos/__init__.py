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
from pql_tpu.algos.eq import EQ, EQG, EQS, EQS4, EQSC, EQSCState, EQSdata, MP
from pql_tpu.algos.eqsd import EQSD, EQSD2
from pql_tpu.algos.qtot import QTOTV1, QTOTV2
from pql_tpu.algos.teams import IART, IPPOTeam, IPPOTeam2
from pql_tpu.algos.ppov import IPPOV, PPOV, PPOVState
from pql_tpu.algos.ddpgv import DDPGV, DDPGVState

ALGO_REGISTRY = {
    "PQL": PQL,
    "DDPG": DDPG,
    "DDPGV": DDPGV,
    "SAC": SAC,
    "CrossQ": CrossQ,
    "PPO": PPO,
    "IPPO": IPPO,
    "MAPPO": MAPPO,
    "IDDPG": IDDPG,
    "EQ": EQ,
    "EQG": EQG,
    "EQS": EQS,
    "EQS4": EQS4,
    "EQSC": EQSC,
    "EQSdata": EQSdata,
    "MP": MP,
    "EQSD": EQSD,
    "EQSD2": EQSD2,
    "QTOTV1": QTOTV1,
    "QTOTV2": QTOTV2,
    "IART": IART,
    "IPPOTeam": IPPOTeam,
    "IPPOTeam2": IPPOTeam2,
    "PPOV": PPOV,
    "IPPOV": IPPOV,
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
