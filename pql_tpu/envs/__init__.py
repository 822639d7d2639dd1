"""Environment registry and factory.

Mirrors the reference's task lookup (``isaacgym_task_map[name]``, reference
pql/utils/isaacgym_util.py:8-24) with an in-repo registry of JAX-native
tasks. ``make_env(cfg)``/``make_eval_env(cfg)`` correspond to
create_task_env for the train and eval env instances.
"""

from pql_tpu.envs.base import Task, VecEnv, VecEnvState, handle_timeout
from pql_tpu.envs.classic import Cartpole, Pendulum, PointMass, Reacher
from pql_tpu.envs.rigid import Ant
from pql_tpu.envs.hand import AllegroHand
from pql_tpu.envs.bimanual import BimanualReacher, BimanualReacherSym

TASK_REGISTRY = {
    "Cartpole": Cartpole,
    "Pendulum": Pendulum,
    "PointMass": PointMass,
    "Reacher": Reacher,
    "Ant": Ant,
    "AllegroHand": AllegroHand,
    "BimanualReacher": BimanualReacher,
    "BimanualReacherSym": BimanualReacherSym,
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
    "Cartpole",
    "Pendulum",
    "PointMass",
    "Reacher",
    "Ant",
    "AllegroHand",
]
