"""Vision tasks: synthetic on-device rendering for the visual-policy tier.

The reference's vision agents (pql/algo/ppoV.py, ippoV.py) consume dict
observations from external bidex Isaac Gym camera envs: camera images,
proprioceptive state, a point cloud, and a privileged full state for the
critic (reference ppoV.py:20-56). Here the same contract is provided by
JAX-native tasks that RENDER inside the jitted step — a rasterizer of
gaussian splats over the scene geometry — so the whole visual pipeline
(sim → render → encode → update) is one XLA program with zero host
round-trips, instead of the reference's GPU-camera→CPU-uint8 staging
(ppoV.py:54-56).

Contract added on top of the flat Task protocol (the flat obs doubles as
the PRIVILEGED critic observation):
- ``visual_spec``: static dict of shapes,
- ``proprio(state)``   -> [D_p] policy-side state,
- ``pointcloud(state)``-> [N, 3] scene points,
- ``render(state)``    -> [cams, T, H, W, 3] frame-stacked images
  (T=2: previous and current frame, from the q_prev kept in the state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pql_tpu.envs.classic import Reacher


def _splat(grid_x, grid_y, pts, sigma: float):
    """Accumulate gaussian splats of pts [K, 2] onto grid [H, W]."""
    d2 = (grid_x[None] - pts[:, 0, None, None]) ** 2 + (
        grid_y[None] - pts[:, 1, None, None]
    ) ** 2
    return jnp.clip(jnp.sum(jnp.exp(-d2 / (2.0 * sigma**2)), axis=0), 0.0, 1.0)


class ReacherVision(Reacher):
    """Reacher with camera/pointcloud observations.

    Flat obs (privileged, for the critic + obs_rms) is the standard
    Reacher observation; the policy sees proprio (6) + pointcloud (40×3)
    + a 1-camera 2-frame 48×48 image.
    """

    height = 48
    width = 48
    num_cams = 1
    frames = 2
    n_link_pts = 16
    n_target_pts = 8
    proprio_dim = 6

    visual_spec = dict(
        img=(1, 2, 48, 48, 3),
        pc=(2 * 16 + 8, 3),
        proprio=6,
    )

    # world extent mapped onto the image
    view = 0.25

    def init_state(self, rng):
        s = super().init_state(rng)
        s["q_prev"] = s["q"]
        return s

    def dynamics(self, state, action, rng):
        q_now = state["q"]
        next_state, reward, term, info = super().dynamics(
            {k: v for k, v in state.items() if k != "q_prev"}, action, rng
        )
        next_state["q_prev"] = q_now
        return next_state, reward, term, info

    # ------------------------------------------------------------ geometry

    def _link_points(self, q):
        """Points along both links [2*n_link_pts, 2]."""
        elbow = self.link1 * jnp.stack([jnp.cos(q[0]), jnp.sin(q[0])])
        tip = elbow + self.link2 * jnp.stack(
            [jnp.cos(q[0] + q[1]), jnp.sin(q[0] + q[1])]
        )
        t1 = jnp.linspace(0.0, 1.0, self.n_link_pts)[:, None]
        seg1 = t1 * elbow[None]
        seg2 = elbow[None] + t1 * (tip - elbow)[None]
        return jnp.concatenate([seg1, seg2], axis=0)

    def _target_points(self, target):
        ang = jnp.linspace(0.0, 2.0 * jnp.pi, self.n_target_pts, endpoint=False)
        return target[None] + 0.01 * jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)

    # ------------------------------------------------------------- contract

    def proprio(self, state):
        return jnp.concatenate([jnp.cos(state["q"]), jnp.sin(state["q"]), state["qd"]])

    def pointcloud(self, state):
        pts2d = jnp.concatenate(
            [self._link_points(state["q"]), self._target_points(state["target"])], axis=0
        )
        return jnp.concatenate([pts2d, jnp.zeros((pts2d.shape[0], 1))], axis=-1)

    def _frame(self, q, target):
        h, w = self.height, self.width
        ys = jnp.linspace(-self.view, self.view, h)
        xs = jnp.linspace(-self.view, self.view, w)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        sigma = 2.0 * self.view / h
        arm = _splat(gx, gy, self._link_points(q), sigma)
        tgt = _splat(gx, gy, self._target_points(target), sigma)
        return jnp.stack([arm, tgt, jnp.zeros_like(arm)], axis=-1)  # [H, W, 3]

    def render(self, state):
        prev = self._frame(state["q_prev"], state["target"])
        cur = self._frame(state["q"], state["target"])
        return jnp.stack([prev, cur], axis=0)[None]  # [1 cam, 2, H, W, 3]


class BimanualReacherVision:
    """Two-agent vision task: wraps BimanualReacher with per-hand proprio,
    a shared scene point cloud, and privileged flat obs — the contract the
    reference's IPPOV consumes (reference ippoV.py:24-61: per-hand
    policy-state + pointcloud actors, privileged-state critics)."""

    def __init__(self):
        from pql_tpu.envs.bimanual import BimanualReacher

        self._task = BimanualReacher()
        self.obs_dim = self._task.obs_dim
        self.action_dim = self._task.action_dim
        self.max_episode_length = self._task.max_episode_length
        self.multi = self._task.multi
        self.equivariance = self._task.equivariance

    proprio_dim = 6  # per hand: cos q(2), sin q(2), qd(2)
    n_pts = 40
    visual_spec = dict(pc=(40, 3), proprio=6)

    def init_state(self, rng):
        return self._task.init_state(rng)

    def get_obs(self, state):
        return self._task.get_obs(state)

    def dynamics(self, state, action, rng):
        return self._task.dynamics(state, action, rng)

    def get_symmetry(self, state):
        return self._task.get_symmetry(state)

    def proprio(self, state):
        """[2, 6] per-hand proprio in local frames."""
        q, qd = state["q"], state["qd"]
        return jnp.concatenate([jnp.cos(q), jnp.sin(q), qd], axis=-1)

    def pointcloud(self, state):
        """Shared scene cloud [40, 3]: 16 pts per arm + 4 per target,
        in world coordinates (z=0 plane)."""
        t = self._task
        pts = []
        for arm in range(2):
            handed = 1.0 if arm == 0 else -1.0
            base_x = handed * t.base_half_gap
            q = state["q"][arm]
            elbow = jnp.stack(
                [base_x + handed * t.link1 * jnp.cos(q[0]), t.link1 * jnp.sin(q[0])]
            )
            tip_l = t._tip_local(q)
            tip = jnp.stack([base_x + handed * tip_l[0], tip_l[1]])
            base = jnp.stack([base_x, 0.0])
            s = jnp.linspace(0.0, 1.0, 8)[:, None]
            pts.append(base[None] + s * (elbow - base)[None])
            pts.append(elbow[None] + s * (tip - elbow)[None])
            tgt_l = state["target"][arm]
            tgt = jnp.stack([base_x + handed * tgt_l[0], tgt_l[1]])
            ang = jnp.linspace(0.0, 2.0 * jnp.pi, 4, endpoint=False)
            pts.append(tgt[None] + 0.01 * jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1))
        pts2d = jnp.concatenate(pts, axis=0)
        return jnp.concatenate([pts2d, jnp.zeros((pts2d.shape[0], 1))], axis=-1)
