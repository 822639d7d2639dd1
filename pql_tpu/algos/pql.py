"""PQL — Parallel Q-Learning as a single fused SPMD program (the flagship).

The reference implements PQL as three asynchronous processes — an Isaac Gym
sim actor (reference pql/algo/pql_actor.py), a Ray critic V-learner
(pql/algo/pql_v_learner.py) on its own GPU, and a Ray policy P-learner
(pql/algo/pql_p_learner.py) — coupled by a feedback rate controller that
holds the critic:sim and critic:actor update ratios at configured targets
(scripts/train_pql.py:127-158, pql_algo.yaml:17-18). That process split
exists because one GPU cannot overlap sim and learning inside one program.

On TPU the idiomatic design fuses all three roles into ONE jitted step,
shard_mapped over the mesh env axis:

    per outer iteration (one XLA program):
      sim phase    : horizon_len vmapped env steps, mixed exploration noise
                     (per-env std ladder over the *global* env index),
                     obs-rms Welford merge across shards, n-step staging,
                     ring-replay write — all in local HBM
      critic phase : critic_sample_ratio × (sample local replay shard →
                     TD/C51 update, grads pmean'd over the mesh → polyak)
      actor phase  : (critic_sample_ratio / critic_actor_ratio) × DPG
                     updates on obs sampled from the same replay

The async rate controller becomes *exact integer ratios* — deterministic
and reproducible — and "weight shipping" (pql_actor.py:122-126,
train_pql.py:111-119) vanishes: every shard always holds current params.
The V-learner's transition buffer and the P-learner's obs-only buffer
(pql_p_learner.py:32-37) are one sharded ring: the P-learner stream is
exactly the obs field of the V-learner stream, so storing it once is
semantically identical and halves HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from pql_tpu.algos import base
from pql_tpu.envs import make_task
from pql_tpu.envs.base import VecEnv, handle_timeout
from pql_tpu.ops import RunningMeanStd, add_mixed_normal_noise, add_normal_noise, soft_update
from pql_tpu.ops.noise import per_row_uniform
from pql_tpu.ops.schedules import schedule_value
from pql_tpu.ops.distributional import binary_cross_entropy, categorical_td_target
from pql_tpu.ops.pallas import categorical_td_target_pallas
from pql_tpu.parallel import make_mesh, state_pspecs
from pql_tpu.replay import (
    create_nstep,
    create_replay,
    nstep_scan,
    replay_add,
    replay_sample,
    replay_slots,
)
from pql_tpu.utils.trackers import Tracker

# state field → array axis carrying the env dimension (see parallel.mesh)
ENV_AXIS_FIELDS = {
    "env_state": 0,
    "obs": 0,
    "nstep": 1,
    "replay": 1,
    "cur_returns": 0,
    "cur_lengths": 0,
}


@struct.dataclass
class PQLState:
    actor_params: Any
    actor_opt: Any
    critic_params: Any
    critic_opt: Any
    critic_target: Any
    obs_rms: RunningMeanStd
    env_state: Any
    obs: jax.Array
    nstep: Any
    replay: Any
    cur_returns: jax.Array  # [E] running episode returns (sharded)
    cur_lengths: jax.Array  # [E]
    return_tracker: Tracker  # replicated — updated outside shard_map
    len_tracker: Tracker
    success_tracker: Tracker
    rng: jax.Array
    # PER-ENV step counter (sim steps each env has taken = iterations x
    # horizon). Stored per-env so int32 can never overflow: the TOTAL
    # env-step count exceeds 2^31 within ~35 minutes at flagship rate
    # (the r5 'calm' probe wrapped to negative steps at 2.15B) — hosts
    # derive total = env_steps * num_envs in arbitrary-precision python.
    env_steps: jax.Array
    critic_update_count: jax.Array
    actor_update_count: jax.Array


class PQL:
    """Fused PQL trainer over a device mesh."""

    name = "PQL"

    def __init__(self, cfg, mesh=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.num_devices)
        self.axis = self.mesh.axis_names[0]
        self.n_shards = self.mesh.devices.size
        if cfg.num_envs % self.n_shards:
            raise ValueError(f"num_envs={cfg.num_envs} not divisible by mesh size {self.n_shards}")
        if cfg.algo.batch_size % self.n_shards:
            raise ValueError(f"batch_size={cfg.algo.batch_size} not divisible by mesh size")
        self.num_envs = cfg.num_envs
        self.e_local = cfg.num_envs // self.n_shards
        self.batch_local = cfg.algo.batch_size // self.n_shards

        task = make_task(cfg.task)
        self.env_local = VecEnv(task, self.e_local)  # per-shard view
        self.env_global = VecEnv(task, cfg.num_envs)  # for init
        self.obs_dim = task.obs_dim
        self.action_dim = task.action_dim

        (
            self.actor,
            self.critic,
            self._actor_params0,
            self._critic_params0,
            self.actor_tx,
            self.critic_tx,
            self._actor_opt0,
            self._critic_opt0,
        ) = base.init_actor_critic(cfg, self.env_global, jax.random.PRNGKey(cfg.seed))

        # Flat-parameter hot path: AdamW + grad-clip + polyak over ~30 small
        # param leaves cost ~0.35 ms of tiny-op overhead PER UPDATE on TPU;
        # raveling actor/critic params into single contiguous vectors makes
        # the whole optimizer/target chain a handful of fused wide ops.
        # Networks unravel on the fly inside the loss (reshapes are free).
        from jax.flatten_util import ravel_pytree

        self._actor_flat0, self._unravel_a = ravel_pytree(self._actor_params0)
        self._critic_flat0, self._unravel_c = ravel_pytree(self._critic_params0)
        self._actor_opt0 = self.actor_tx.init(self._actor_flat0)
        self._critic_opt0 = self.critic_tx.init(self._critic_flat0)

        # does the task report a success signal? (info-tracking parity with
        # reference update_tracker, pql_actor.py:139-147)
        probe = jax.eval_shape(
            lambda k: task.dynamics(task.init_state(k), jnp.zeros(task.action_dim), k)[3],
            jax.random.PRNGKey(0),
        )
        self.has_success = "success" in probe

        # update-ratio schedule: deterministic integer version of the
        # reference's feedback controller (train_pql.py:127-158)
        self.n_critic = int(cfg.algo.critic_sample_ratio)
        self.n_actor = max(self.n_critic // int(cfg.algo.critic_actor_ratio), 1)

        self._build_jitted()

    # ------------------------------------------------------------ building

    def _build_jitted(self):
        cfg = self.cfg
        state_shape = jax.eval_shape(self._init_global, jax.random.PRNGKey(0))
        self.pspecs = state_pspecs(state_shape, ENV_AXIS_FIELDS, self.axis)
        self.shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(self.mesh, s),
            self.pspecs,
            is_leaf=lambda x: isinstance(x, P),
        )
        # Pin row-major OUTPUT layouts for the replay buffer on the INIT
        # program only (wide rows only — narrow rows would pad the
        # 128-lane minor dim ~12x). Every later program specializes its
        # entry on the argument's ACTUAL layout, so seeding init with the
        # layout the loop body computes in ({2,1,0}: the row-gather and
        # ring DUS) keeps the whole steady state copy-free; left to auto,
        # init emits an envs-minor layout and every training dispatch pays
        # two full-buffer conversion copies (1.55 ms/iter, Ant@4096).
        # No in_shardings pins anywhere: a hard entry pin crashes when XLA
        # refuses the layout (observed on AllegroHand@8192); if XLA
        # refuses init's out-pin the result is only the old copies.
        from jax.experimental.layout import Format, Layout

        init_shardings = self.shardings.replace(
            replay=jax.tree_util.tree_map(
                lambda shape_leaf, sh: (
                    Format(Layout(major_to_minor=tuple(range(shape_leaf.ndim))), sh)
                    if getattr(shape_leaf, "ndim", 0) == 3 and shape_leaf.shape[-1] >= 64
                    else sh
                ),
                state_shape.replay,
                self.shardings.replay,
            )
        )
        self.init = jax.jit(self._init_global, out_shardings=init_shardings)

        events_spec = {
            k: P(None, self.axis) for k in ("ep_returns", "ep_lengths", "success", "done")
        }

        def make_step(horizon: int, random: bool, n_critic: int, n_actor: int,
                      iters: int = 1):
            inner = shard_map(
                partial(
                    self._fused_step_local,
                    horizon=horizon,
                    random=random,
                    n_critic=n_critic,
                    n_actor=n_actor,
                ),
                mesh=self.mesh,
                in_specs=(self.pspecs,),
                out_specs=(self.pspecs, events_spec, P()),
                check_vma=False,
            )

            def one(state):
                state, events, losses = inner(state)
                state = self._update_trackers(state, events)
                return state, losses

            def outer(state):
                if iters == 1:
                    state, losses = one(state)
                else:
                    # amortize the per-dispatch host/tunnel overhead (~3 ms
                    # per XLA execution on a remote chip) over several
                    # fused iterations — identical op sequence, one launch
                    state, losses_t = jax.lax.scan(
                        lambda s, _: one(s), state, None, length=iters
                    )
                    losses = jnp.mean(losses_t, axis=0)
                metrics = {
                    "train/critic_loss": losses[0],
                    "train/actor_loss": losses[1],
                    "train/return": state.return_tracker.mean(),
                    "train/episode_length": state.len_tracker.mean(),
                    "train/success_rate": state.success_tracker.mean(),
                }
                return state, metrics

            return jax.jit(outer, donate_argnums=0)

        self.train_iter = make_step(
            cfg.algo.horizon_len, False, self.n_critic * cfg.algo.horizon_len,
            self.n_actor * cfg.algo.horizon_len,
        )
        self.iters_per_call = max(int(cfg.algo.iters_per_call), 1)
        # multi-iteration launch: iters_per_call fused iterations per
        # dispatch (each = horizon sim steps + ratio'd updates)
        self.train_block = (
            self.train_iter
            if self.iters_per_call == 1
            else make_step(
                cfg.algo.horizon_len, False,
                self.n_critic * cfg.algo.horizon_len,
                self.n_actor * cfg.algo.horizon_len,
                iters=self.iters_per_call,
            )
        )
        # warm-up: random exploration, no learning (train_pql.py:58)
        self.warmup = make_step(cfg.algo.warm_up, True, 0, 0)

    def set_ratios(self, critic_sample_ratio: int, critic_actor_ratio: int) -> None:
        """Re-jit the fused step with new update ratios, mid-training.

        The TPU analog of the reference's runtime rate controller
        (train_pql.py:127-158): ratios are exact static integers compiled
        into the step, so adapting them means rebuilding the jitted
        programs (cheap under the persistent compilation cache; a cold
        scalar-physics re-jit still costs ~1-2 min — see
        ``precompile_ratio_ladder`` for the stall-free path, noting the
        axon backend can defer the server-side compile to an
        executable's FIRST CALL, so even a precompiled rung may stall
        once on first use when its cache entry is cold). The train
        state is a jit INPUT — params, optimizer, replay, rng and counters
        carry over untouched, so training continues seamlessly at the new
        ratios (tested: tests/test_algos.py ratio-switch counter test).
        """
        self.cfg.algo.critic_sample_ratio = int(critic_sample_ratio)
        self.cfg.algo.critic_actor_ratio = int(critic_actor_ratio)
        self.n_critic = int(critic_sample_ratio)
        self.n_actor = max(self.n_critic // int(critic_actor_ratio), 1)
        self._build_jitted()
        ladder = getattr(self, "_ladder", None)
        if ladder:
            compiled = ladder.get((self.n_critic, self.n_actor))
            if compiled is not None:  # pre-traced + pre-compiled executable
                self.train_block = compiled

    def precompile_ratio_ladder(self, state, factor: int = 2, max_ratio: int = 32):
        """AOT-compile the adaptive controller's escalation rungs up front.

        A mid-flagship-run escalation (``RatioController`` →
        ``set_ratios``) otherwise pays a full trace + compile at the new
        ratios — tens of minutes cold on a remote TPU for scalar-physics
        tasks, enough to look like a wedged run. Here each rung
        (critic_sample_ratio × factor^k ≤ max_ratio, same
        critic_actor_ratio) is lowered and compiled against the live
        state's shapes BEFORE training starts, and the compiled
        executables are kept; a later ``set_ratios`` to a prepared rung
        swaps in the executable with zero retrace/recompile. Returns the
        list of prepared rungs.
        """
        orig = (self.cfg.algo.critic_sample_ratio, self.cfg.algo.critic_actor_ratio)
        self._ladder = {}
        rungs = []
        rung = orig[0] * factor
        while rung <= max_ratio:
            self.set_ratios(rung, orig[1])
            self._ladder[(self.n_critic, self.n_actor)] = self.train_block.lower(
                state
            ).compile()
            rungs.append(rung)
            rung *= factor
        self.set_ratios(*orig)
        return rungs

    # ---------------------------------------------------------------- init

    def _init_global(self, rng) -> PQLState:
        cfg = self.cfg
        k_env, k_loop = jax.random.split(rng)
        env_state, obs = self.env_global.reset(k_env)
        slots = replay_slots(cfg.algo.memory_size, cfg.num_envs, cfg.algo.horizon_len)
        replay = create_replay(
            slots=slots,
            num_envs=cfg.num_envs,
            obs_dim=self.obs_dim,
            action_dim=self.action_dim,
            obs_dtype=jnp.bfloat16 if cfg.algo.replay_dtype == "bfloat16" else jnp.float32,
            valid_start=cfg.algo.nstep - 1,
        )
        tracker_len = cfg.algo.tracker_len
        return PQLState(
            actor_params=self._actor_flat0,
            actor_opt=self._actor_opt0,
            critic_params=self._critic_flat0,
            critic_opt=self._critic_opt0,
            critic_target=self._critic_flat0,
            obs_rms=RunningMeanStd.create((self.obs_dim,)),
            env_state=env_state,
            obs=obs,
            nstep=create_nstep(
                cfg.num_envs, self.obs_dim, self.action_dim, cfg.algo.nstep, cfg.algo.gamma
            ),
            replay=replay,
            cur_returns=jnp.zeros(cfg.num_envs, jnp.float32),
            cur_lengths=jnp.zeros(cfg.num_envs, jnp.float32),
            return_tracker=Tracker.create(tracker_len),
            len_tracker=Tracker.create(tracker_len),
            success_tracker=Tracker.create(tracker_len),
            rng=k_loop,
            env_steps=jnp.zeros((), jnp.int32),
            critic_update_count=jnp.zeros((), jnp.int32),
            actor_update_count=jnp.zeros((), jnp.int32),
        )

    # -------------------------------------------------------- shard kernel

    def _fused_step_local(
        self, state: PQLState, *, horizon: int, random: bool, n_critic: int, n_actor: int
    ):
        """One fused PQL iteration on the local shard (runs inside
        shard_map; collectives: rms psum, grad pmean, loss pmean)."""
        cfg = self.cfg
        ax = jax.lax.axis_index(self.axis)
        rng, k_roll, k_crit, k_act = jax.random.split(state.rng, 4)
        # sim-phase rng is NOT folded per shard: every per-env draw (noise,
        # env dynamics, resets) derives from the env's GLOBAL index, so the
        # simulated stream is bitwise identical for any mesh size
        # (tests/test_sharding_equivalence.py). Learner-phase keys still
        # fold per shard — replay sampling is local by design.
        gs = ax * self.e_local  # this shard's first global env index

        # exploration-noise decay (cfg.algo.noise.decay): evaluate the
        # schedule at the iteration index. The reference builds the same
        # schedulers (pql_actor.py:44-54) but never steps them; this is
        # the working version. decay=None → static std_max (identical
        # numerics to the undecayed path).
        iter_idx = state.env_steps // cfg.algo.horizon_len
        std_hi = schedule_value(cfg.algo.noise, iter_idx)

        # ---------------- sim phase (pql_actor.explore_env, :87-127) ------
        def sim_step(carry, _):
            env_state, obs, obs_rms, cur_ret, cur_len, k = carry
            k, k_a, k_n, k_e = jax.random.split(k, 4)
            if cfg.algo.obs_norm:
                obs_rms = obs_rms.update_sharded(obs, self.axis)
                obs_n = obs_rms.normalize(obs)
            else:
                obs_n = obs
            if random:
                action = per_row_uniform(
                    k_a, (self.e_local, self.action_dim), jnp.float32, -1.0, 1.0, gs
                )
            elif cfg.algo.noise.type == "mixed":
                action = add_mixed_normal_noise(
                    k_n,
                    self.actor.apply(self._unravel_a(state.actor_params), obs_n),
                    cfg.algo.noise.std_min,
                    std_hi,
                    out_bounds=(-1.0, 1.0),
                    num_envs_global=self.num_envs,
                    global_start=gs,
                )
            else:
                action = add_normal_noise(
                    k_n,
                    self.actor.apply(self._unravel_a(state.actor_params), obs_n),
                    std_hi,
                    out_bounds=(-1.0, 1.0),
                    global_start=gs,
                )
            env_state, next_obs, reward, done, info = self.env_local.step(
                env_state, action, k_e, global_start=gs
            )

            # episode accounting (pql_actor.update_tracker, :129-147)
            cur_ret = cur_ret + reward
            cur_len = cur_len + 1.0
            events = dict(
                ep_returns=cur_ret,
                ep_lengths=cur_len,
                success=info.get("success", jnp.zeros_like(reward)),
                done=done,
            )
            done_mask = done > 0.5
            cur_ret = jnp.where(done_mask, 0.0, cur_ret)
            cur_len = jnp.where(done_mask, 0.0, cur_len)

            done_b = handle_timeout(done, info) if cfg.algo.handle_timeout else done
            out = dict(
                obs=obs,
                action=action,
                reward=(cfg.algo.reward_scale * reward)[..., None],
                next_obs=next_obs,
                done=done_b[..., None],
            )
            return (env_state, next_obs, obs_rms, cur_ret, cur_len, k), (out, events)

        carry = (state.env_state, state.obs, state.obs_rms, state.cur_returns, state.cur_lengths, k_roll)
        carry, (traj, events) = jax.lax.scan(sim_step, carry, None, length=horizon)
        env_state, obs, obs_rms, cur_returns, cur_lengths, _ = carry

        nstep, emitted, _valid = nstep_scan(state.nstep, traj)
        replay = replay_add(state.replay, emitted)

        state = state.replace(
            env_state=env_state,
            obs=obs,
            obs_rms=obs_rms,
            cur_returns=cur_returns,
            cur_lengths=cur_lengths,
            nstep=nstep,
            replay=replay,
            rng=rng,
            env_steps=state.env_steps + horizon,
        )

        # ---------------- critic phase (pql_v_learner.learn, :73-115) -----
        gamma_n = cfg.algo.gamma ** cfg.algo.nstep

        def critic_loss_fn(critic_params, batch, k_tgt):
            obs_n = obs_rms.normalize_clip(batch["obs"]) if cfg.algo.obs_norm else batch["obs"]
            next_obs_n = (
                obs_rms.normalize_clip(batch["next_obs"]) if cfg.algo.obs_norm else batch["next_obs"]
            )
            # target-policy smoothing with the *current* actor — PQL ships
            # the live actor, no target actor (pql_v_learner.py:62-71)
            next_actions = base.target_policy_actions(
                cfg, self.actor, self._unravel_a(state.actor_params), next_obs_n, k_tgt
            )
            if cfg.algo.distl:
                p1_t, p2_t = self.critic.apply(
                    self._unravel_c(state.critic_target), next_obs_n, next_actions
                )
                # Pallas kernel on TPU keeps the [B, A, A] hat-weight
                # tensor out of HBM (pql_tpu.ops.pallas); dense math
                # elsewhere — both property-tested identical
                project = (
                    categorical_td_target_pallas
                    if cfg.algo.use_pallas and jax.default_backend() == "tpu"
                    else categorical_td_target
                )
                target = project(
                    p1_t, p2_t, batch["reward"], batch["done"], gamma_n,
                    cfg.algo.v_min, cfg.algo.v_max,
                )
                target = jax.lax.stop_gradient(target)
                p1, p2 = self.critic.apply(
                    self._unravel_c(critic_params), obs_n, batch["action"]
                )
                loss = binary_cross_entropy(p1, target) + binary_cross_entropy(p2, target)
            else:
                q_next = self.critic.apply(
                    self._unravel_c(state.critic_target), next_obs_n, next_actions,
                    method=type(self.critic).q_min,
                )
                target = batch["reward"] + (1.0 - batch["done"]) * gamma_n * q_next
                target = jax.lax.stop_gradient(target)
                q1, q2 = self.critic.apply(
                    self._unravel_c(critic_params), obs_n, batch["action"]
                )
                loss = jnp.mean(jnp.square(q1 - target)) + jnp.mean(jnp.square(q2 - target))
            return loss

        def critic_update(c, bk):
            critic_params, critic_opt, critic_target = c
            first, k_t = bk
            # prefetch_batches: `first` is the pre-gathered batch; else the
            # sample key (one gather per update). Key derivation identical.
            batch = (
                first
                if cfg.algo.prefetch_batches
                else replay_sample(
                    replay, first, self.batch_local, sample_slots=cfg.algo.sample_slots
                )
            )
            loss, grads = jax.value_and_grad(critic_loss_fn)(critic_params, batch, k_t)
            grads = jax.lax.pmean(grads, self.axis)
            loss = jax.lax.pmean(loss, self.axis)
            updates, critic_opt = self.critic_tx.update(grads, critic_opt, critic_params)
            critic_params = jax.tree_util.tree_map(lambda p, u: p + u, critic_params, updates)
            critic_target = soft_update(critic_target, critic_params, cfg.algo.tau)
            return (critic_params, critic_opt, critic_target), loss

        if n_critic > 0:
            keys = jax.random.split(k_crit, n_critic)
            k_ss, k_ts = jax.vmap(
                lambda k: tuple(jax.random.split(jax.random.fold_in(k, ax)))
            )(keys)
            if cfg.algo.prefetch_batches:
                # one wide [n_critic × batch] row-gather up front — the ring
                # is static through the learner phases, so this is bitwise
                # identical to per-update gathers (tested)
                xs = (
                    jax.vmap(
                        lambda ks: replay_sample(
                            replay, ks, self.batch_local,
                            sample_slots=cfg.algo.sample_slots,
                        )
                    )(k_ss),
                    k_ts,
                )
            else:
                xs = (k_ss, k_ts)
            (critic_params, critic_opt, critic_target), c_losses = jax.lax.scan(
                critic_update,
                (state.critic_params, state.critic_opt, state.critic_target),
                xs,
                unroll=True,
            )
            critic_loss = jnp.mean(c_losses)
            state = state.replace(
                critic_params=critic_params,
                critic_opt=critic_opt,
                critic_target=critic_target,
                critic_update_count=state.critic_update_count + n_critic,
            )
        else:
            critic_loss = jnp.zeros(())

        # ---------------- actor phase (pql_p_learner.learn, :47-64) -------
        def actor_loss_fn(actor_params, obs_n):
            action = self.actor.apply(self._unravel_a(actor_params), obs_n)
            q = self.critic.apply(
                self._unravel_c(jax.lax.stop_gradient(state.critic_params)),
                obs_n, action, method=type(self.critic).q_min,
            )
            return -jnp.mean(q)

        def actor_update(c, x):
            actor_params, actor_opt = c
            batch = (
                x
                if cfg.algo.prefetch_batches
                else replay_sample(
                    replay, x, self.batch_local, fields=("obs",),
                    sample_slots=cfg.algo.sample_slots,
                )
            )
            obs_n = obs_rms.normalize_clip(batch["obs"]) if cfg.algo.obs_norm else batch["obs"]
            loss, grads = jax.value_and_grad(actor_loss_fn)(actor_params, obs_n)
            grads = jax.lax.pmean(grads, self.axis)
            loss = jax.lax.pmean(loss, self.axis)
            updates, actor_opt = self.actor_tx.update(grads, actor_opt, actor_params)
            actor_params = jax.tree_util.tree_map(lambda p, u: p + u, actor_params, updates)
            return (actor_params, actor_opt), loss

        if n_actor > 0:
            keys = jax.random.split(k_act, n_actor)
            k_ss = jax.vmap(lambda k: jax.random.fold_in(k, ax))(keys)
            if cfg.algo.prefetch_batches:
                xs = jax.vmap(
                    lambda ks: replay_sample(
                        replay, ks, self.batch_local, fields=("obs",),
                        sample_slots=cfg.algo.sample_slots,
                    )
                )(k_ss)
            else:
                xs = k_ss
            (actor_params, actor_opt), a_losses = jax.lax.scan(
                actor_update, (state.actor_params, state.actor_opt), xs,
                unroll=True,
            )
            actor_loss = jnp.mean(a_losses)
            state = state.replace(
                actor_params=actor_params,
                actor_opt=actor_opt,
                actor_update_count=state.actor_update_count + n_actor,
            )
        else:
            actor_loss = jnp.zeros(())

        return state, events, jnp.stack([critic_loss, actor_loss])

    # --------------------------------------------------------- tracker fold

    def _update_trackers(self, state: PQLState, events) -> PQLState:
        """Fold per-step episode-completion events (gathered across shards)
        into the replicated sliding-window trackers."""
        done = events["done"].reshape(-1) > 0.5
        state = state.replace(
            return_tracker=state.return_tracker.update(events["ep_returns"].reshape(-1), done),
            len_tracker=state.len_tracker.update(events["ep_lengths"].reshape(-1), done),
        )
        if self.has_success:
            state = state.replace(
                success_tracker=state.success_tracker.update(events["success"].reshape(-1), done)
            )
        return state

    # ---------------------------------------------------------- eval hook

    def eval_actor_apply(self, params, obs_n):
        # state.actor_params is the raveled flat vector (see __init__)
        return self.actor.apply(self._unravel_a(params), obs_n)
