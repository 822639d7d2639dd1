"""pql_tpu — a TPU-native Parallel Q-Learning framework.

A from-scratch JAX/XLA/pjit/Pallas re-design of the capabilities of the
reference PQL implementation (supersglzc/pql, ICML 2023, arXiv 2307.12983):
off-policy RL under massively parallel simulation.

Where the reference splits training into three asynchronous GPU processes
(Isaac Gym sim actor, Ray-hosted critic V-learner, policy P-learner —
reference scripts/train_pql.py:28-187), this framework compiles the whole
actor-learner system into a single sharded SPMD program: vectorized JAX
environments step in lockstep under jit, feed an on-HBM circular n-step
replay buffer, and drive Double-Q/DDPG and distributional (C51) critic
updates at configured critic:sim and critic:actor ratios. It scales across
multi-chip TPU meshes by sharding the environment and replay axes and
syncing gradients with psum over ICI.

Subpackages
-----------
- ``pql_tpu.cfg``      — dataclass config tree + CLI overrides (hydra-like UX)
- ``pql_tpu.envs``     — pure-functional vectorized JAX environments
- ``pql_tpu.models``   — Flax model zoo (MLP policies/critics, distributional,
                         equivariant, diffusion, vision/pointnet)
- ``pql_tpu.replay``   — on-device circular replay + n-step staging
- ``pql_tpu.ops``      — numeric ops (C51 projection, noise, normalizers,
                         schedules) incl. Pallas TPU kernels
- ``pql_tpu.algos``    — PQL (fused SPMD step), DDPG, SAC, PPO, CrossQ, and
                         the multi-agent research tier
- ``pql_tpu.parallel`` — mesh construction, sharding rules, multi-host init
- ``pql_tpu.utils``    — trackers, checkpointing, logging, evaluation
- ``pql_tpu.native``   — native (C++) host-RAM replay ring for
                         vision-scale off-policy data (the analog of the
                         reference's fp16-on-CPU ``reserve_space`` buffers,
                         pql/replay/simple_replay.py:8-15)
"""

__version__ = "0.1.0"
