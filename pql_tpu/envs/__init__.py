"""Environment registry and factory.

Mirrors the reference's task lookup (``isaacgym_task_map[name]``, reference
pql/utils/isaacgym_util.py:8-24) with an in-repo registry of JAX-native
tasks. ``make_env(cfg)``/``make_eval_env(cfg)`` correspond to
create_task_env for the train and eval env instances.
"""

from pql_tpu.envs.base import Task, VecEnv, VecEnvState, handle_timeout
from pql_tpu.envs.classic import BallBalance, Cartpole, Pendulum, PointMass, Reacher
from pql_tpu.envs.rigid import Ant, Anymal, Humanoid
from pql_tpu.envs.hand import AllegroHand, ShadowHand
from pql_tpu.envs.manip import FrankaCubeStack
from pql_tpu.envs.bimanual import BimanualReacher, BimanualReacherSym
from pql_tpu.envs.vision import BimanualReacherVision, ReacherVision

TASK_REGISTRY = {
    "Cartpole": Cartpole,
    "Pendulum": Pendulum,
    "PointMass": PointMass,
    "Reacher": Reacher,
    "BallBalance": BallBalance,
    "Ant": Ant,
    "Humanoid": Humanoid,
    "Anymal": Anymal,
    "AllegroHand": AllegroHand,
    "ShadowHand": ShadowHand,
    "FrankaCubeStack": FrankaCubeStack,
    "BimanualReacher": BimanualReacher,
    "BimanualReacherSym": BimanualReacherSym,
    "ReacherVision": ReacherVision,
    "BimanualReacherVision": BimanualReacherVision,
}


def register_task(name: str, cls) -> None:
    TASK_REGISTRY[name] = cls


def make_task(name: str) -> Task:
    if name not in TASK_REGISTRY:
        raise KeyError(f"Unknown task '{name}'. Available: {sorted(TASK_REGISTRY)}")
    return TASK_REGISTRY[name]()


def make_env(cfg) -> VecEnv:
    """Training env with cfg.num_envs parallel instances."""
    return VecEnv(make_task(cfg.task), cfg.num_envs)


def make_eval_env(cfg) -> VecEnv:
    """Separate eval env with cfg.eval_num_envs instances (reference
    default.yaml:12, evaluator gets its own sim, pql/utils/evaluator.py:50)."""
    return VecEnv(make_task(cfg.task), cfg.eval_num_envs)


__all__ = [
    "Task",
    "VecEnv",
    "VecEnvState",
    "handle_timeout",
    "TASK_REGISTRY",
    "register_task",
    "make_task",
    "make_env",
    "make_eval_env",
] + sorted(TASK_REGISTRY)
