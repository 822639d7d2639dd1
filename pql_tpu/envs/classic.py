"""Analytic control tasks (JAX-native, contact-free).

These fill the role of the reference's Isaac Gym task suite for framework
development, testing and throughput benchmarking; the rigid-body tasks
(Ant, Humanoid, AllegroHand, ...) live in ``pql_tpu.envs.rigid`` on the
in-repo physics engine. Cartpole mirrors the IsaacGymEnvs Cartpole task
(observation layout, reward shaping, reset bounds) since that is the
reference's smoke-test task.

All dynamics are single-env pure functions — the VecEnv wrapper vmaps them.
State is a plain dict of scalars/vectors so tree_map-based auto-reset works.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Cartpole:
    """Continuous-force cart-pole balance (IsaacGymEnvs 'Cartpole' analog).

    obs = [cart_pos, cart_vel, pole_angle, pole_angvel]
    reward = 1 - θ² - 0.01|ẋ| - 0.005|θ̇|, −2 on falling outside bounds.
    """

    obs_dim = 4
    action_dim = 1
    max_episode_length = 500

    force_mag = 10.0
    dt = 1.0 / 60.0
    gravity = 9.8
    masscart = 1.0
    masspole = 0.1
    length = 0.5  # half pole length
    reset_dist = 3.0

    def init_state(self, rng):
        # small random initial displacement, like IGE's randomized DOF reset
        vals = jax.random.uniform(rng, (4,), jnp.float32, -0.1, 0.1)
        return {"x": vals[0], "x_dot": vals[1], "theta": vals[2], "theta_dot": vals[3]}

    def get_obs(self, state):
        return jnp.stack([state["x"], state["x_dot"], state["theta"], state["theta_dot"]])

    def dynamics(self, state, action, rng):
        force = self.force_mag * jnp.clip(action[0], -1.0, 1.0)
        x, x_dot = state["x"], state["x_dot"]
        theta, theta_dot = state["theta"], state["theta_dot"]

        costh, sinth = jnp.cos(theta), jnp.sin(theta)
        total_mass = self.masscart + self.masspole
        polemass_length = self.masspole * self.length
        temp = (force + polemass_length * theta_dot**2 * sinth) / total_mass
        theta_acc = (self.gravity * sinth - costh * temp) / (
            self.length * (4.0 / 3.0 - self.masspole * costh**2 / total_mass)
        )
        x_acc = temp - polemass_length * theta_acc * costh / total_mass

        # semi-implicit Euler
        x_dot = x_dot + self.dt * x_acc
        x = x + self.dt * x_dot
        theta_dot = theta_dot + self.dt * theta_acc
        theta = theta + self.dt * theta_dot

        fell = jnp.logical_or(
            jnp.abs(x) > self.reset_dist, jnp.abs(theta) > jnp.pi / 2.0
        )
        reward = jnp.where(
            fell,
            -2.0,
            1.0 - theta**2 - 0.01 * jnp.abs(x_dot) - 0.005 * jnp.abs(theta_dot),
        )
        next_state = {"x": x, "x_dot": x_dot, "theta": theta, "theta_dot": theta_dot}
        return next_state, reward, fell, {}


class Pendulum:
    """Torque-limited pendulum swing-up (gym Pendulum-v1 analog).

    obs = [cosθ, sinθ, θ̇]; never terminates early (pure time limit), which
    exercises the truncation-bootstrap path.
    """

    obs_dim = 3
    action_dim = 1
    max_episode_length = 200

    max_torque = 2.0
    max_speed = 8.0
    dt = 0.05
    g = 10.0
    m = 1.0
    l = 1.0

    def init_state(self, rng):
        k1, k2 = jax.random.split(rng)
        return {
            "theta": jax.random.uniform(k1, (), jnp.float32, -jnp.pi, jnp.pi),
            "theta_dot": jax.random.uniform(k2, (), jnp.float32, -1.0, 1.0),
        }

    def get_obs(self, state):
        return jnp.stack(
            [jnp.cos(state["theta"]), jnp.sin(state["theta"]), state["theta_dot"]]
        )

    def dynamics(self, state, action, rng):
        u = self.max_torque * jnp.clip(action[0], -1.0, 1.0)
        th, thdot = state["theta"], state["theta_dot"]
        norm_th = jnp.mod(th + jnp.pi, 2.0 * jnp.pi) - jnp.pi
        cost = norm_th**2 + 0.1 * thdot**2 + 0.001 * u**2

        thdot = thdot + self.dt * (
            3.0 * self.g / (2.0 * self.l) * jnp.sin(th)
            + 3.0 / (self.m * self.l**2) * u
        )
        thdot = jnp.clip(thdot, -self.max_speed, self.max_speed)
        th = th + self.dt * thdot
        return {"theta": th, "theta_dot": thdot}, -cost, jnp.asarray(False), {}


class PointMass:
    """2-D point mass reaching a random goal; has a 'success' info channel
    like the reference bimanual tasks (pql/algo/ac_base.py:85)."""

    obs_dim = 6  # pos(2), vel(2), goal-pos delta(2)
    action_dim = 2
    max_episode_length = 100

    dt = 0.05
    damping = 0.95
    success_dist = 0.1

    def init_state(self, rng):
        k1, k2 = jax.random.split(rng)
        return {
            "pos": jax.random.uniform(k1, (2,), jnp.float32, -1.0, 1.0),
            "vel": jnp.zeros(2, jnp.float32),
            "goal": jax.random.uniform(k2, (2,), jnp.float32, -1.0, 1.0),
        }

    def get_obs(self, state):
        return jnp.concatenate(
            [state["pos"], state["vel"], state["goal"] - state["pos"]]
        )

    def dynamics(self, state, action, rng):
        accel = jnp.clip(action, -1.0, 1.0)
        vel = state["vel"] * self.damping + self.dt * accel
        pos = state["pos"] + self.dt * vel
        dist = jnp.linalg.norm(state["goal"] - pos)
        success = dist < self.success_dist
        reward = -dist - 0.01 * jnp.sum(accel**2) + jnp.where(success, 1.0, 0.0)
        next_state = {"pos": pos, "vel": vel, "goal": state["goal"]}
        return (
            next_state,
            reward,
            jnp.asarray(False),
            {"success": success.astype(jnp.float32)},
        )


class Reacher:
    """Two-link planar arm reaching a random target (MuJoCo Reacher analog)."""

    obs_dim = 10  # cos(2), sin(2), qvel(2), target(2), fingertip-target(2)
    action_dim = 2
    max_episode_length = 150

    dt = 0.02
    link1 = 0.1
    link2 = 0.11
    max_torque = 1.0
    damping = 0.99

    def init_state(self, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        radius = jax.random.uniform(k3, (), jnp.float32, 0.05, 0.2)
        angle = jax.random.uniform(k2, (), jnp.float32, -jnp.pi, jnp.pi)
        return {
            "q": jax.random.uniform(k1, (2,), jnp.float32, -0.1, 0.1),
            "qd": jnp.zeros(2, jnp.float32),
            "target": radius * jnp.stack([jnp.cos(angle), jnp.sin(angle)]),
        }

    def _fingertip(self, q):
        x = self.link1 * jnp.cos(q[0]) + self.link2 * jnp.cos(q[0] + q[1])
        y = self.link1 * jnp.sin(q[0]) + self.link2 * jnp.sin(q[0] + q[1])
        return jnp.stack([x, y])

    def get_obs(self, state):
        tip = self._fingertip(state["q"])
        return jnp.concatenate(
            [
                jnp.cos(state["q"]),
                jnp.sin(state["q"]),
                state["qd"],
                state["target"],
                tip - state["target"],
            ]
        )

    def dynamics(self, state, action, rng):
        torque = self.max_torque * jnp.clip(action, -1.0, 1.0)
        # unit-inertia double integrator per joint with damping — cheap but
        # shaped like the real task (torque → qdd)
        qd = state["qd"] * self.damping + self.dt * torque / 0.01
        qd = jnp.clip(qd, -10.0, 10.0)
        q = state["q"] + self.dt * qd
        tip = self._fingertip(q)
        dist = jnp.linalg.norm(tip - state["target"])
        reward = -dist - 0.1 * jnp.sum(jnp.square(action))
        success = dist < 0.02
        next_state = {"q": q, "qd": qd, "target": state["target"]}
        return (
            next_state,
            reward,
            jnp.asarray(False),
            {"success": success.astype(jnp.float32)},
        )


class BallBalance:
    """Keep a rolling ball centered on a tilting tray (IGE 'BallBalance'
    analog; the reference lists it with reward_scale 0.1 and a 3600 s
    budget, pql/utils/common.py:159-182). State: tray pitch/roll (+rates)
    and ball position/velocity on the tray plane; actions are tray
    torques; the ball accelerates down the tilt with rolling inertia."""

    obs_dim = 10  # pitch, roll, pitch_rate, roll_rate, ball xy, ball vel xy, dist, speed
    action_dim = 2
    max_episode_length = 500

    dt = 1.0 / 60.0
    gravity = 9.81
    tray_inertia = 0.5
    tray_damping = 0.98
    max_torque = 3.0
    max_tilt = 0.5
    tray_radius = 0.5
    roll_factor = 5.0 / 7.0  # solid-sphere rolling

    def init_state(self, rng):
        k1, k2 = jax.random.split(rng)
        return {
            "tilt": jax.random.uniform(k1, (2,), jnp.float32, -0.05, 0.05),
            "tilt_rate": jnp.zeros(2, jnp.float32),
            "ball": jax.random.uniform(k2, (2,), jnp.float32, -0.25, 0.25),
            "ball_vel": jnp.zeros(2, jnp.float32),
        }

    def get_obs(self, state):
        dist = jnp.linalg.norm(state["ball"])
        speed = jnp.linalg.norm(state["ball_vel"])
        return jnp.concatenate(
            [state["tilt"], state["tilt_rate"], state["ball"], state["ball_vel"],
             dist[None], speed[None]]
        )

    def dynamics(self, state, action, rng):
        torque = self.max_torque * jnp.clip(action, -1.0, 1.0)
        tilt_rate = state["tilt_rate"] * self.tray_damping + self.dt * torque / self.tray_inertia
        tilt = jnp.clip(state["tilt"] + self.dt * tilt_rate, -self.max_tilt, self.max_tilt)
        # ball rolls down the slope: a = (5/7) g sin(tilt) along each axis
        acc = self.roll_factor * self.gravity * jnp.sin(tilt)
        ball_vel = state["ball_vel"] + self.dt * acc
        ball = state["ball"] + self.dt * ball_vel

        dist = jnp.linalg.norm(ball)
        off_tray = dist > self.tray_radius
        reward = jnp.where(
            off_tray,
            -5.0,
            1.0 - 2.0 * dist - 0.1 * jnp.linalg.norm(ball_vel)
            - 0.05 * jnp.sum(jnp.square(action)),
        )
        success = jnp.logical_and(dist < 0.05, jnp.linalg.norm(ball_vel) < 0.1)
        next_state = {"tilt": tilt, "tilt_rate": tilt_rate, "ball": ball, "ball_vel": ball_vel}
        return next_state, reward, off_tray, {"success": success.astype(jnp.float32)}
