"""Dataclass configuration tree mirroring the reference hydra configs.

Reference layout (all file:line cites into /root/reference):
- top-level defaults: ``pql/cfg/default.yaml`` (num_envs=4096, eval_num_envs=150,
  seed=42, max_time=3600, ...)
- shared actor-critic knobs: ``pql/cfg/algo/actor_critic.yaml`` (lrs 5e-4,
  batch 8192, max_grad_norm 0.5, obs_norm, tracker_len 100, ...)
- per-algo groups: ``pql/cfg/algo/{pql,ddpg,sac,ppo}_algo.yaml``
- programmatic post-processing: per-task reward_scale / max_time tables
  (``pql/utils/common.py:148-182``) and PPO per-task presets
  (``pql/utils/common.py:246-275``).

CLI override grammar matches hydra's basic form:
    train.py algo=pql task=Ant num_envs=8192 algo.batch_size=16384
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any


# --------------------------------------------------------------------------
# leaf groups
# --------------------------------------------------------------------------


@dataclass
class NoiseConfig:
    """Exploration-noise block (reference pql/cfg/algo/pql_algo.yaml:26-34)."""

    type: str = "mixed"  # 'fixed' | 'mixed'
    decay: str | None = None  # None | 'linear' | 'exp'
    exp_decay_rate: float = 0.99
    lin_decay_iters: int = 10000
    std_max: float = 0.8
    std_min: float = 0.05
    tgt_pol_std: float = 0.8
    tgt_pol_noise_bound: float = 0.2


@dataclass
class DistConfig:
    """Multi-host (multi-process) job description (pql_tpu.parallel.distributed).

    The reference has no cross-host story (Ray actors within one machine,
    SURVEY §2.9); on TPU pods one process per host joins a single SPMD
    program. All-None = single process. On a TPU pod slice set
    ``auto_tpu_pod=true`` (coordinator discovered from TPU metadata);
    elsewhere pass coordinator_address/num_processes/process_id explicitly
    (or PQL_COORDINATOR / PQL_NUM_PROCESSES / PQL_PROCESS_ID env vars).
    """

    coordinator_address: str | None = None
    num_processes: int | None = None
    process_id: int | None = None
    auto_tpu_pod: bool = False


@dataclass
class LoggingConfig:
    """Logging sinks (reference pql/cfg/logging/default.yaml)."""

    mode: str = "local"  # 'local' (JSONL+console) | 'wandb' (if installed) | 'off'
    project: str = "pql_tpu"
    run_name: str | None = None
    out_dir: str = "runs"
    console: bool = True


@dataclass
class AlgoConfig:
    """Algorithm hyperparameters.

    Union of the reference algo groups; unused knobs are ignored by
    algorithms that do not need them (same as the hydra composition).
    Defaults reproduce ``actor_critic.yaml`` + ``pql_algo.yaml``.
    """

    name: str = "PQL"
    # --- shared (actor_critic.yaml) ---
    actor_lr: float = 5e-4
    critic_lr: float = 5e-4
    batch_size: int = 8192
    reward_scale: float = 1.0
    max_grad_norm: float | None = 0.5
    tracker_len: int = 100
    obs_norm: bool = True
    value_norm: bool = False
    handle_timeout: bool = True
    log_freq: int = 2
    eval_freq: int = 200
    # --- off-policy common (pql_algo.yaml / ddpg_algo.yaml / sac_algo.yaml) ---
    horizon_len: int = 1
    memory_size: int = 5_000_000
    nstep: int = 3
    tau: float = 0.05
    gamma: float = 0.99
    warm_up: int = 32
    act_class: str = "TanhMLPPolicy"
    cri_class: str = "DoubleQ"
    update_times: int = 8
    no_tgt_actor: bool = True
    noise: NoiseConfig = field(default_factory=NoiseConfig)
    # --- PQL ratios (pql_algo.yaml:17-18) ---
    critic_actor_ratio: int = 2
    critic_sample_ratio: int = 8
    # Adaptive target-ratio control (pql_tpu/utils/ratio_control.py): on
    # an eval-return stall, escalate critic_sample_ratio ×adapt_factor up
    # to adapt_max_ratio via PQL.set_ratios (host-side re-jit). The fused
    # design's analog of the reference's feedback controller
    # (train_pql.py:127-158) — see the module docstring for why the
    # adapted quantity differs.
    adaptive_ratios: bool = False
    adapt_window: int = 6
    adapt_factor: int = 2
    adapt_max_ratio: int = 32
    # AOT-compile every escalation rung before training starts so a
    # mid-run escalation swaps executables instead of re-tracing (a cold
    # re-jit of a scalar-physics task on a remote TPU costs minutes —
    # PQL.precompile_ratio_ladder)
    adapt_precompile: bool = True
    # --- PQL-D distributional (pql_algo.yaml:36-39) ---
    distl: bool = False
    v_min: float = -10.0
    v_max: float = 10.0
    num_atoms: int = 51
    # --- SAC (sac_algo.yaml) ---
    alpha: float | None = None
    alpha_lr: float = 5e-3
    # --- PPO (ppo_algo.yaml) ---
    use_gae: bool = True
    value_clip: bool = True
    lambda_gae_adv: float = 0.95
    lambda_entropy: float = 0.0
    ratio_clip: float = 0.2
    # --- multi-agent (reference cfg.task.multi.same_policy, ippo.py:35-39) ---
    same_policy: bool = False
    # --- diffusion policies (reference eqsd.py:31, cfg.algo.diffusion_iter) ---
    diffusion_iter: int = 5
    # EQSD team-actor choice (reference eqsd.py:29-33)
    diffusion: bool = False
    # EQSD2 scheduled KL weight (reference eqsd2.py:55, kl_max → 0)
    kl_max: float = 1.0
    kl_decay_iters: int = 1000
    # Local pretrained-weight file for vision encoders (.npz / .pth /
    # orbax dir — pql_tpu/models/pretrained.py). The air-gap analog of
    # the reference's torchvision/torch-hub downloads (visual.py:183-210).
    encoder_weights: str | None = None
    # --- TPU-specific ---
    # Compute dtype for network forward passes ('float32' | 'bfloat16').
    # Params are always stored in float32.
    compute_dtype: str = "float32"
    # Replay storage dtype ('float32' | 'bfloat16'); bfloat16 halves the HBM
    # footprint of the 5e6-transition buffer (analog of the reference's
    # fp16-on-CPU `reserve_space` path, pql/replay/simple_replay.py:8-15).
    replay_dtype: str = "float32"
    # PQL: fused train iterations executed per XLA dispatch (amortizes the
    # per-launch host overhead; 1 = one iteration per call).
    iters_per_call: int = 4
    # Use the Pallas TPU kernel for the C51 target projection (PQL-D).
    use_pallas: bool = True
    # Replay sampling: 0 = independent (slot, env) pairs — the reference's
    # exact iid scheme, ONE packed row-gather per batch (fastest measured
    # on TPU with the packed buffer); n > 0 = slot-stratified window over
    # n slots (same uniform marginals; see replay_sample — can trigger
    # pathological XLA buffer-splitting in fused loops, keep 0).
    sample_slots: int = 0
    # PQL: gather ALL critic/actor-phase batches in one batched row-gather
    # before the update scan instead of one gather per update. Bitwise-
    # identical math (the replay ring is static during the learner phases
    # and the per-update key derivation is unchanged — tested); trades
    # n small gathers for one wide one, which XLA can overlap better.
    prefetch_batches: bool = False


def _algo_presets() -> dict[str, dict[str, Any]]:
    """Per-algo overrides relative to AlgoConfig defaults.

    Values mirror reference pql/cfg/algo/{ddpg,sac,ppo,pql}_algo.yaml.
    """
    return {
        "pql": dict(name="PQL", eval_freq=200),
        "pql_d": dict(name="PQL", distl=True, eval_freq=200),
        "ddpg": dict(name="DDPG", eval_freq=100, update_times=8),
        # visual off-policy through the C++ host ring (reserve_space
        # analog, ref simple_replay.py:8-15)
        "ddpgv": dict(name="DDPGV", eval_freq=100, update_times=4),
        "sac": dict(
            name="SAC",
            act_class="TanhDiagGaussianMLPPolicy",
            eval_freq=100,
            update_times=8,
        ),
        "crossq": dict(
            name="CrossQ",
            cri_class="DoubleQBatchNorm",
            eval_freq=100,
            update_times=8,
        ),
        "ppo": dict(
            name="PPO",
            horizon_len=16,
            batch_size=32768,
            act_class="DiagGaussianMLPPolicy",
            cri_class="MLPCritic",
            eval_freq=20,
            update_times=4,
        ),
        # multi-agent research tier (reference pql/algo/ippo.py etc. have no
        # yaml of their own; they reuse ppo_algo.yaml with alg swapped)
        "ippo": dict(
            name="IPPO",
            horizon_len=16,
            batch_size=32768,
            act_class="DiagGaussianMLPPolicy",
            cri_class="MLPCritic",
            eval_freq=20,
            update_times=4,
        ),
        "mappo": dict(
            name="MAPPO",
            horizon_len=16,
            batch_size=32768,
            act_class="DiagGaussianMLPPolicy",
            cri_class="MLPCritic",
            eval_freq=20,
            update_times=4,
        ),
        "iddpg": dict(name="IDDPG", eval_freq=100, update_times=8),
    }


def _ppo_like(name: str, **extra: Any) -> dict[str, Any]:
    """The equivariant/team research agents reuse the PPO hyperparam group
    with the agent class swapped (the reference gives them no yaml of
    their own)."""
    d = dict(
        name=name,
        horizon_len=16,
        batch_size=32768,
        act_class="DiagGaussianMLPPolicy",
        cri_class="MLPCritic",
        eval_freq=20,
        update_times=4,
    )
    d.update(extra)
    return d


def _eq_presets() -> dict[str, dict[str, Any]]:
    eq_models = dict(
        act_class="DiagGaussianEquivariantMLPPolicy",
        cri_class="MLPCriticEquivariant",
    )
    return {
        "eq": _ppo_like("EQ", **eq_models),
        "eqg": _ppo_like("EQG", **eq_models),
        "eqs": _ppo_like("EQS", **eq_models),
        "eqs4": _ppo_like("EQS4", **eq_models),
        "mp": _ppo_like("MP"),
        "eqsc": _ppo_like("EQSC", **eq_models),
        "eqsdata": _ppo_like("EQSdata"),  # plain nets + data augmentation
        "eqsd": _ppo_like("EQSD", **eq_models),
        "eqsd2": _ppo_like("EQSD2", **eq_models),
        "qtotv1": _ppo_like("QTOTV1"),
        "qtotv2": _ppo_like("QTOTV2"),
        "iart": _ppo_like("IART"),
        "ippoteam": _ppo_like("IPPOTeam"),
        "ippoteam2": _ppo_like("IPPOTeam2"),
        "ppov": _ppo_like("PPOV"),
        "ippov": _ppo_like("IPPOV"),
    }


@dataclass
class Config:
    """Top-level config (reference pql/cfg/default.yaml)."""

    task: str = "Cartpole"
    algo: AlgoConfig = field(default_factory=AlgoConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)
    dist: DistConfig = field(default_factory=DistConfig)

    num_envs: int = 4096
    eval_num_envs: int = 150
    seed: int = 42
    max_step: int | None = None
    max_time: float = 3600.0  # seconds
    artifact: str | None = None  # checkpoint path to resume from

    # info-dict tracking (reference default.yaml:32-35)
    info_track_keys: tuple[str, ...] | None = None
    info_track_step: tuple[str, ...] | None = None

    # per-task hyperparam presets analogous to `isaac_param`
    # (reference common.py:246-275)
    task_param: bool = False

    # --- TPU mesh ---
    # Number of devices to shard the env/replay axis over; None = all.
    num_devices: int | None = None
    mesh_axis: str = "env"

    # Force a JAX backend ("cpu"/"tpu"); None = image default. Needed as a
    # cfg (not env var) because this image's site hook pre-selects
    # jax_platforms at interpreter start, so JAX_PLATFORMS from the shell
    # is ignored — only jax.config.update before the first backend query
    # works (same mechanism as tests/conftest.py).
    platform: str | None = None

    checkpoint_dir: str | None = None
    checkpoint_freq: int = 0  # in outer iterations; 0 = only best-eval saves

    # jax.profiler trace output dir (None = off); the TPU analog of the
    # reference's hand-rolled rate-measurement telemetry (SURVEY §5)
    profile_dir: str | None = None
    profile_iters: int = 20  # iterations to capture after warm-up


# --------------------------------------------------------------------------
# per-task preset tables (reference pql/utils/common.py:148-182, 246-275)
# --------------------------------------------------------------------------

TASK_REWARD_SCALE: dict[str, float] = {
    "AllegroHand": 0.01,
    "Ant": 0.01,
    "Humanoid": 0.01,
    "Anymal": 1.0,
    "FrankaCubeStack": 0.1,
    "ShadowHand": 0.01,
    "BallBalance": 0.1,
}

TASK_MAX_TIME: dict[str, float] = {
    "AllegroHand": 4800,
    "Ant": 3600,
    "Humanoid": 3600,
    "Anymal": 1800,
    "FrankaCubeStack": 3600,
    "ShadowHand": 4800,
    "BallBalance": 3600,
}

PPO_TASK_PRESETS: dict[str, dict[str, Any]] = {
    "Ant": dict(num_envs=4096, batch_size=32768, horizon_len=16, update_times=4),
    "Humanoid": dict(
        num_envs=4096, batch_size=32768, horizon_len=32, update_times=5, value_norm=True
    ),
    "Anymal": dict(num_envs=4096, batch_size=32768, horizon_len=16, update_times=5),
    "AllegroHand": dict(
        num_envs=16384, batch_size=32768, horizon_len=8, update_times=5, value_norm=True
    ),
    "ShadowHand": dict(
        num_envs=16384, batch_size=32768, horizon_len=8, update_times=5, value_norm=True
    ),
    "FrankaCubeStack": dict(
        num_envs=8192, batch_size=16384, horizon_len=32, update_times=5
    ),
}


def preprocess_config(cfg: Config, user_overrode: set[str] | None = None) -> Config:
    """Apply per-task tables, mirroring reference preprocess_cfg.

    The reference only rewrites reward_scale/max_time when the user kept the
    defaults (common.py:167-169,181-182); we reproduce that by checking
    against the default values.
    """
    user_overrode = user_overrode or set()
    if cfg.task in TASK_REWARD_SCALE and cfg.algo.reward_scale == 1.0:
        cfg.algo.reward_scale = TASK_REWARD_SCALE[cfg.task]
    if cfg.task in TASK_MAX_TIME and cfg.max_time == 3600.0:
        cfg.max_time = TASK_MAX_TIME[cfg.task]
    if cfg.algo.name == "PPO" and cfg.task_param and cfg.task in PPO_TASK_PRESETS:
        preset = PPO_TASK_PRESETS[cfg.task]
        for k, v in preset.items():
            if k == "num_envs":
                cfg.num_envs = v
            else:
                setattr(cfg.algo, k, v)
    return cfg


# --------------------------------------------------------------------------
# CLI parsing
# --------------------------------------------------------------------------


def algo_config(name: str) -> AlgoConfig:
    """Build an AlgoConfig for a named algo group (like hydra `algo=...`)."""
    presets = _algo_presets()
    presets.update(_eq_presets())
    key = name.lower()
    if key not in presets:
        raise ValueError(f"Unknown algo '{name}'. Available: {sorted(presets)}")
    cfg = AlgoConfig()
    for k, v in presets[key].items():
        setattr(cfg, k, v)
    return cfg


def _coerce(value: str, ref: Any) -> Any:
    """Coerce a CLI string to the type of the existing field value."""
    if value.lower() in ("null", "none"):
        return None
    if isinstance(ref, bool):
        return value.lower() in ("1", "true", "yes", "on")
    if isinstance(ref, int) and not isinstance(ref, bool):
        return int(float(value))
    if isinstance(ref, float):
        return float(value)
    if isinstance(ref, tuple):
        items = [v for v in value.strip("[]()").split(",") if v]
        return tuple(items)
    if ref is None:
        # untyped None default: best-effort numeric, else string
        try:
            f = float(value)
            return int(f) if f.is_integer() and "." not in value else f
        except ValueError:
            return value
    return value


def _set_dotted(cfg: Any, key: str, value: str) -> None:
    parts = key.split(".")
    obj = cfg
    for p in parts[:-1]:
        if not hasattr(obj, p):
            raise AttributeError(f"No config group '{p}' in override '{key}'")
        obj = getattr(obj, p)
    leaf = parts[-1]
    if not hasattr(obj, leaf):
        raise AttributeError(f"No config field '{key}'")
    setattr(obj, leaf, _coerce(value, getattr(obj, leaf)))


def parse_cli(argv: list[str], base: Config | None = None) -> Config:
    """Parse hydra-style ``key=value`` overrides into a Config.

    ``algo=<name>`` swaps the whole algo group first (like hydra group
    selection), then dotted overrides apply on top, in order.
    """
    cfg = base or Config()
    # group selection first, regardless of position
    rest = []
    for arg in argv:
        if "=" not in arg:
            raise ValueError(f"Expected key=value override, got '{arg}'")
        k, v = arg.split("=", 1)
        if k == "algo":
            cfg.algo = algo_config(v)
        else:
            rest.append((k, v))
    overrode = set()
    for k, v in rest:
        _set_dotted(cfg, k, v)
        overrode.add(k)
    cfg = preprocess_config(cfg, overrode)
    if cfg.platform:
        # force the backend here, while no backend is initialized yet —
        # every CLI entry point parses its config before touching jax
        # (see Config.platform: the image's site hook makes JAX_PLATFORMS
        # from the shell a no-op)
        import jax

        jax.config.update("jax_platforms", cfg.platform)
    return cfg


def make_config(algo: str = "pql", **overrides: Any) -> Config:
    """Programmatic config construction: make_config('ddpg', num_envs=16)."""
    cfg = Config(algo=algo_config(algo))
    for k, v in overrides.items():
        obj = cfg
        parts = k.split("__")  # allow algo__batch_size=... style kwargs
        for p in parts[:-1]:
            obj = getattr(obj, p)
        setattr(obj, parts[-1], v)
    return preprocess_config(cfg)


def to_dict(cfg: Any) -> Any:
    """Recursively convert the config tree to plain dicts (for logging)."""
    if is_dataclass(cfg) and not isinstance(cfg, type):
        return {f.name: to_dict(getattr(cfg, f.name)) for f in fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    return cfg
