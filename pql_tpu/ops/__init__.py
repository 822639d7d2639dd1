"""Numeric building blocks: normalizers, noise, schedules, distributional ops.

Pure JAX functions / pytree dataclasses, each reproducing the semantics of a
reference utility (cited per-module), plus Pallas TPU kernels for the hot
paths under ``pql_tpu.ops.pallas``.
"""

from pql_tpu.ops.running_norm import RunningMeanStd, normalize_clip
from pql_tpu.ops.noise import add_normal_noise, add_mixed_normal_noise, mixed_noise_std
from pql_tpu.ops.schedules import LinearSchedule, ExponentialSchedule, schedule_value
from pql_tpu.ops.distributional import categorical_projection, categorical_td_target
from pql_tpu.ops.soft_update import soft_update
from pql_tpu.ops.pallas import categorical_projection_pallas, categorical_td_target_pallas
from pql_tpu.ops.ddpm import DDPMSchedule, ddpm_add_noise, ddpm_sample, ddpm_step, make_ddpm_schedule

__all__ = [
    "RunningMeanStd",
    "normalize_clip",
    "add_normal_noise",
    "add_mixed_normal_noise",
    "mixed_noise_std",
    "LinearSchedule",
    "ExponentialSchedule",
    "schedule_value",
    "categorical_projection",
    "categorical_td_target",
    "soft_update",
]
