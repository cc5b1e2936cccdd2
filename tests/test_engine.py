"""Rigid-body engine tests: exactness vs CPython MuJoCo + stability.

The engine's FK / mass matrix / bias forces are validated against the
installed MuJoCo's mj_forward on the same MJCF models — the dynamics core
must match to float32 precision; contact/limit models are penalty-based
approximations validated for stability and physical sanity instead.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from promp_tpu.envs.mujoco.engine import Engine
from promp_tpu.envs.mujoco.model import get_model

mujoco = pytest.importorskip("mujoco")


def _mj_model(name):
    import os

    import gymnasium
    assets = os.path.join(os.path.dirname(gymnasium.__file__),
                          "envs/mujoco/assets")
    return mujoco.MjModel.from_xml_path(os.path.join(assets, f"{name}.xml"))


@pytest.mark.parametrize("name", ["half_cheetah", "walker2d", "hopper",
                                  "swimmer"])
class TestPlanarDynamicsVsMujoco:
    def _setup(self, name, seed=0):
        model = get_model(name)
        eng = Engine(model)
        m = _mj_model(name)
        d = mujoco.MjData(m)
        rng = np.random.RandomState(seed)
        qpos = m.qpos0 + rng.uniform(-0.2, 0.2, m.nq)
        qvel = rng.randn(m.nv) * 0.5
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        mujoco.mj_forward(m, d)
        return model, eng, m, d, qpos, qvel

    def test_fk_matches(self, name):
        model, eng, m, d, qpos, qvel = self._setup(name)
        kin = eng.fk(jnp.asarray(qpos, jnp.float32))
        np.testing.assert_allclose(np.asarray(kin["body_pos"]), d.xpos[1:],
                                   atol=2e-6)
        com = d.xipos[1:]
        np.testing.assert_allclose(np.asarray(kin["com"]), com, atol=2e-6)

    def test_mass_matrix_matches(self, name):
        model, eng, m, d, qpos, qvel = self._setup(name)
        M_mj = np.zeros((m.nv, m.nv))
        mujoco.mj_fullM(m, d, M_mj)
        M_us = np.asarray(eng.mass_matrix(jnp.asarray(qpos, jnp.float32)))
        np.testing.assert_allclose(M_us, M_mj, atol=5e-5,
                                   rtol=1e-4)

    def test_bias_forces_match(self, name):
        model, eng, m, d, qpos, qvel = self._setup(name)
        # MuJoCo qfrc_bias = C(q,qd)qd + G opposing motion; our bias+gravity
        # enter the torque SUM, so ours == -qfrc_bias
        ours = np.asarray(
            eng._bias_torque(jnp.asarray(qpos, jnp.float32),
                             jnp.asarray(qvel, jnp.float32))
            + eng.gravity_torque(jnp.asarray(qpos, jnp.float32)))
        scale = max(1.0, np.abs(d.qfrc_bias).max())
        np.testing.assert_allclose(ours, -d.qfrc_bias, atol=2e-4 * scale)


def test_fluid_forces_match_qfrc_passive():
    """Inertia-box fluid model == MuJoCo qfrc_passive on the swimmer MJCF.

    Swimmer's <option> sets density=4000, viscosity=0.1; qfrc_passive =
    fluid + joint dampers there (no springs), so ours must reproduce
    fluid_torque - damping*qvel."""
    model = get_model("swimmer")
    assert model.density > 0 and model.viscosity > 0
    eng = Engine(model)
    m = _mj_model("swimmer")
    d = mujoco.MjData(m)
    rng = np.random.RandomState(7)
    for trial in range(3):
        d.qpos[:] = m.qpos0 + rng.uniform(-0.3, 0.3, m.nq)
        d.qvel[:] = rng.randn(m.nv) * 1.5
        mujoco.mj_forward(m, d)
        ours = np.asarray(
            eng.fluid_torque(jnp.asarray(d.qpos, jnp.float32),
                             jnp.asarray(d.qvel, jnp.float32))
            - jnp.asarray(model.dof_damping, jnp.float32)
            * jnp.asarray(d.qvel, jnp.float32))
        scale = max(1.0, np.abs(d.qfrc_passive).max())
        np.testing.assert_allclose(ours, d.qfrc_passive,
                                   atol=2e-4 * scale, rtol=2e-4)


@pytest.mark.parametrize("name,nsub", [("half_cheetah", 1), ("walker2d", 1),
                                       ("hopper", 1), ("ant", 8)])
def test_rollout_stability(name, nsub):
    """Random-action rollouts stay finite and above ground."""
    model = get_model(name)
    eng = Engine(model, n_substeps=nsub)
    q0 = jnp.asarray(model.init_qpos, jnp.float32)
    qd0 = jnp.zeros(model.nv)

    @jax.jit
    def roll(key):
        def body(carry, k):
            q, qd = carry
            a = jax.random.uniform(k, (model.nu,), jnp.float32, -0.5, 0.5)
            q, qd = eng.step(q, qd, a, 5)
            return (q, qd), jnp.max(jnp.abs(qd))
        return jax.lax.scan(body, (q0, qd0),
                            jax.random.split(jax.random.PRNGKey(0), 40))

    (qf, qdf), vmax = roll(jax.random.PRNGKey(1))
    assert bool(jnp.all(jnp.isfinite(qf)))
    assert bool(jnp.all(jnp.isfinite(qdf)))
    assert float(jnp.max(vmax)) < 200.0


def test_energy_conservation_no_contact():
    """With gravity off, no damping/contacts, kinetic energy of a free
    swing should be conserved by the symplectic integrator to ~1%."""
    import dataclasses
    model = get_model("half_cheetah")
    model = dataclasses.replace(
        model, gravity=0.0,
        dof_damping=np.zeros_like(model.dof_damping),
        jnt_stiffness=np.zeros_like(model.jnt_stiffness),
        con_body=(), con_pos=np.zeros((0, 3)), con_radius=np.zeros(0))
    eng = Engine(model, n_substeps=2,
                 limit_stiffness=0.0, limit_damping=0.0)
    q0 = jnp.asarray(model.init_qpos, jnp.float32) + 0.05
    qd0 = 0.3 * jnp.ones(model.nv)

    def energy(q, qd):
        return 0.5 * qd @ eng.mass_matrix(q) @ qd

    @jax.jit
    def roll(q, qd):
        def body(c, _):
            q, qd = c
            q, qd = eng.step(q, qd, jnp.zeros(model.nu), 1)
            return (q, qd), energy(q, qd)
        return jax.lax.scan(body, (q, qd), None, length=50)

    _, es = roll(q0, qd0)
    es = np.asarray(es)
    assert np.isfinite(es).all()
    drift = abs(es[-1] - es[0]) / max(abs(es[0]), 1e-6)
    assert drift < 0.05, f"energy drift {drift:.3f}"


def test_rand_param_mods_change_dynamics():
    model = get_model("half_cheetah")
    eng = Engine(model)
    q = jnp.asarray(model.init_qpos, jnp.float32)
    qd = jnp.zeros(model.nv)
    a = 0.3 * jnp.ones(model.nu)
    q1, _ = jax.jit(lambda: eng.step(q, qd, a, 5))()
    mods = {"body_mass": jnp.full((model.nb,), 3.0),
            "body_inertia": jnp.full((model.nb, 3), 3.0)}
    q2, _ = jax.jit(lambda: eng.step(q, qd, a, 5, mods))()
    assert not np.allclose(np.asarray(q1), np.asarray(q2))
