"""Model registry.

The reference discovers model classes by AST-scanning files and importing
by path (reference pql/models/__init__.py:1-6, pql/utils/common.py:79-100).
Here the registry is an explicit name → class map — same lookup UX
(``algo.act_class='TanhMLPPolicy'``), no dynamic imports.
"""

from pql_tpu.models.mlp import (
    MLPNet,
    TanhMLPPolicy,
    DiagGaussianMLPPolicy,
    TanhDiagGaussianMLPPolicy,
    DoubleQ,
    DoubleQBatchNorm,
    DistributionalDoubleQ,
    MLPCritic,
)
from pql_tpu.models.emlp import (
    EMLP,
    EquivariantMLPNet,
    TanhEquivariantMLPPolicy,
    DiagGaussianEquivariantMLPPolicy,
    MLPCriticEquivariant,
    DoubleQEquivariant,
    FiniteGroup,
    GroupEquivariantLinear,
    GroupEMLP,
)
from pql_tpu.models.diffusion import (
    DiffusionNet,
    DiffusionPolicy,
    MLPResNet,
    StateDiffusionPolicy,
)
from pql_tpu.models.ediffusion import EquivariantDiffusionPolicy
from pql_tpu.models.pointnet import Encoder, MultiStagePointNetEncoder, StateEncoder

MODEL_REGISTRY = {
    "MLPNet": MLPNet,
    "TanhMLPPolicy": TanhMLPPolicy,
    "DiagGaussianMLPPolicy": DiagGaussianMLPPolicy,
    "TanhDiagGaussianMLPPolicy": TanhDiagGaussianMLPPolicy,
    "DoubleQ": DoubleQ,
    "DoubleQBatchNorm": DoubleQBatchNorm,
    "DistributionalDoubleQ": DistributionalDoubleQ,
    "MLPCritic": MLPCritic,
    "EMLP": EMLP,
    "EquivariantMLPNet": EquivariantMLPNet,
    "TanhEquivariantMLPPolicy": TanhEquivariantMLPPolicy,
    "DiagGaussianEquivariantMLPPolicy": DiagGaussianEquivariantMLPPolicy,
    "MLPCriticEquivariant": MLPCriticEquivariant,
    "DoubleQEquivariant": DoubleQEquivariant,
    "DiffusionNet": DiffusionNet,
    "DiffusionPolicy": DiffusionPolicy,
    "StateDiffusionPolicy": StateDiffusionPolicy,
    "MLPResNet": MLPResNet,
    "EquivariantDiffusionPolicy": EquivariantDiffusionPolicy,
    "MultiStagePointNetEncoder": MultiStagePointNetEncoder,
    "StateEncoder": StateEncoder,
    "Encoder": Encoder,
}


def register_model(name: str, cls) -> None:
    MODEL_REGISTRY[name] = cls


def get_model(name: str):
    if name not in MODEL_REGISTRY:
        raise KeyError(f"Unknown model '{name}'. Available: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name]


__all__ = [
    "MODEL_REGISTRY",
    "register_model",
    "get_model",
    "MLPNet",
    "TanhMLPPolicy",
    "DiagGaussianMLPPolicy",
    "TanhDiagGaussianMLPPolicy",
    "DoubleQ",
    "DoubleQBatchNorm",
    "DistributionalDoubleQ",
    "MLPCritic",
]
