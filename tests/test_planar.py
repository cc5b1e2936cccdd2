"""Planar fast-path equivalence (envs/mujoco/planar.py).

The scalar-unrolled planar substep must reproduce the generic engine
substep to float32 precision on every eligible model — with and without
rand-params physics multipliers — and Engine.step must select it
automatically (and honor use_planar=False).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from promp_tpu.envs.mujoco import planar
from promp_tpu.envs.mujoco.engine import Engine
from promp_tpu.envs.mujoco.model import get_model
from promp_tpu.envs.mujoco.rand_params import sample_param_multipliers

PLANAR_MODELS = ["half_cheetah", "walker2d", "hopper"]


def _batch(m, seed, B=8):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(np.tile(m.init_qpos, (B, 1))
                    + rng.uniform(-0.3, 0.3, (B, m.nv)), jnp.float32)
    qd = jnp.asarray(rng.randn(B, m.nv).astype(np.float32))
    tau = jnp.asarray(rng.randn(B, m.nv).astype(np.float32))
    return q, qd, tau


@pytest.mark.parametrize("name", PLANAR_MODELS)
def test_substep_matches_generic(name):
    m = get_model(name)
    assert planar.planar_ok(m)
    eng = Engine(m)
    sub = planar.make_planar_substep(eng)
    q, qd, tau = _batch(m, 0)
    h = jnp.float32(m.timestep)
    gq, gqd = jax.jit(jax.vmap(lambda a, b, t: eng.substep(a, b, t, h)))(
        q, qd, tau)
    pq, pqd = jax.jit(jax.vmap(lambda a, b, t: sub(a, b, t, h)))(q, qd, tau)
    np.testing.assert_allclose(np.asarray(pq), np.asarray(gq),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pqd), np.asarray(gqd),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("name", ["hopper", "walker2d"])
def test_substep_matches_generic_with_mods(name):
    """rand-params multiplier tasks flow through both paths identically."""
    m = get_model(name)
    eng = Engine(m)
    sub = planar.make_planar_substep(eng)
    B = 8
    mods = sample_param_multipliers(jax.random.PRNGKey(0), m, B, 3.0)
    q, qd, tau = _batch(m, 1, B)
    h = jnp.float32(m.timestep)
    gq, gqd = jax.jit(jax.vmap(
        lambda a, b, t, md: eng.substep(a, b, t, h, md)))(q, qd, tau, mods)
    pq, pqd = jax.jit(jax.vmap(
        lambda a, b, t, md: sub(a, b, t, h, md)))(q, qd, tau, mods)
    np.testing.assert_allclose(np.asarray(pq), np.asarray(gq),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pqd), np.asarray(gqd),
                               rtol=1e-3, atol=1e-3)


def test_step_selects_planar_and_flag_disables():
    m = get_model("half_cheetah")
    assert Engine(m)._planar_substep is not None
    assert Engine(m, use_planar=False)._planar_substep is None
    # non-planar models fall back silently
    assert Engine(get_model("ant"))._planar_substep is None


def test_step_trajectories_match():
    """Multi-frame Engine.step: planar on vs off, same trajectory."""
    m = get_model("half_cheetah")
    on, off = Engine(m), Engine(m, use_planar=False)
    q, qd, _tau = _batch(m, 2)
    ctrl = jnp.asarray(np.random.RandomState(3).uniform(
        -1, 1, (q.shape[0], m.nu)).astype(np.float32))
    step = lambda e: jax.jit(jax.vmap(
        lambda a, b, c: e.step(a, b, c, 5)))
    q_on, qd_on = step(on)(q, qd, ctrl)
    q_off, qd_off = step(off)(q, qd, ctrl)
    np.testing.assert_allclose(np.asarray(q_on), np.asarray(q_off),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(qd_on), np.asarray(qd_off),
                               rtol=1e-2, atol=1e-2)


def test_swimmer_not_eligible():
    """Swimmer has a fluid medium (density > 0) — generic path only."""
    assert not planar.planar_ok(get_model("swimmer"))
