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

MODEL_REGISTRY = {
    "MLPNet": MLPNet,
    "TanhMLPPolicy": TanhMLPPolicy,
    "DiagGaussianMLPPolicy": DiagGaussianMLPPolicy,
    "TanhDiagGaussianMLPPolicy": TanhDiagGaussianMLPPolicy,
    "DoubleQ": DoubleQ,
    "DoubleQBatchNorm": DoubleQBatchNorm,
    "DistributionalDoubleQ": DistributionalDoubleQ,
    "MLPCritic": MLPCritic,
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
