"""3-D fast-path equivalence (envs/mujoco/spatial.py).

The scalar-unrolled spatial substep must reproduce the generic engine
substep to float32 precision on the non-planar bodies (ant, humanoid) —
and on a planar model as a cross-check — with and without rand-params
physics multipliers; Engine.step must select it automatically for
non-planar eligible models (planar still wins where eligible).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from promp_tpu.envs.mujoco import spatial
from promp_tpu.envs.mujoco.engine import Engine
from promp_tpu.envs.mujoco.model import get_model
from promp_tpu.envs.mujoco.rand_params import sample_param_multipliers

MODELS = ["ant", "humanoid", "half_cheetah"]


def _batch(m, seed, B=8, spread=0.3):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(np.tile(m.init_qpos, (B, 1))
                    + rng.uniform(-spread, spread, (B, m.nv)), jnp.float32)
    qd = jnp.asarray(rng.randn(B, m.nv).astype(np.float32))
    tau = jnp.asarray(rng.randn(B, m.nv).astype(np.float32))
    return q, qd, tau


@pytest.mark.parametrize("name", MODELS)
def test_substep_matches_generic(name):
    m = get_model(name)
    assert spatial.spatial_ok(m)
    eng = Engine(m, use_planar=False, use_spatial=False)
    sub = spatial.make_spatial_substep(eng)
    q, qd, tau = _batch(m, 0)
    h = jnp.float32(m.timestep)
    gq, gqd = jax.jit(jax.vmap(lambda a, b, t: eng.substep(a, b, t, h)))(
        q, qd, tau)
    sq, sqd = jax.jit(jax.vmap(lambda a, b, t: sub(a, b, t, h)))(q, qd, tau)
    np.testing.assert_allclose(np.asarray(sq), np.asarray(gq),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sqd), np.asarray(gqd),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("name", ["ant", "humanoid"])
def test_substep_matches_generic_with_mods(name):
    """rand-params multiplier tasks flow through both paths identically."""
    m = get_model(name)
    eng = Engine(m, use_planar=False, use_spatial=False)
    sub = spatial.make_spatial_substep(eng)
    B = 8
    mods = sample_param_multipliers(jax.random.PRNGKey(0), m, B, 3.0)
    q, qd, tau = _batch(m, 1, B)
    h = jnp.float32(m.timestep)
    gq, gqd = jax.jit(jax.vmap(
        lambda a, b, t, md: eng.substep(a, b, t, h, md)))(q, qd, tau, mods)
    sq, sqd = jax.jit(jax.vmap(
        lambda a, b, t, md: sub(a, b, t, h, md)))(q, qd, tau, mods)
    np.testing.assert_allclose(np.asarray(sq), np.asarray(gq),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sqd), np.asarray(gqd),
                               rtol=1e-3, atol=1e-3)


def test_step_selection():
    """planar > spatial > generic precedence, and flags disable each.
    On the CPU backend (this test harness) the spatial path is gated OFF
    by default (XLA:CPU miscompile, engine.py spatial_on_cpu note)."""
    ant = get_model("ant")
    assert Engine(ant)._spatial_substep is None          # cpu default
    assert Engine(ant, spatial_on_cpu=True)._spatial_substep is not None
    assert Engine(ant, spatial_on_cpu=True,
                  use_spatial=False)._spatial_substep is None
    # humanoid (nv=23) is gated OFF by size: the scalar program measured
    # slower there than generic + column-unrolled solve (engine.py note)
    assert Engine(get_model("humanoid"),
                  spatial_on_cpu=True)._spatial_substep is None
    assert Engine(get_model("humanoid"), spatial_on_cpu=True,
                  spatial_max_nv=23)._spatial_substep is not None
    # planar-eligible models still prefer the planar path in step()
    cheetah = get_model("half_cheetah")
    e = Engine(cheetah)
    assert e._planar_substep is not None
    # swimmer (fluid medium) is ineligible for both fast paths
    assert not spatial.spatial_ok(get_model("swimmer"))
    assert Engine(get_model("swimmer"),
                  spatial_on_cpu=True)._spatial_substep is None


def test_step_trajectories_match():
    """Multi-frame Engine.step: spatial on vs off, same ant trajectory."""
    m = get_model("ant")
    on = Engine(m, n_substeps=2, spatial_on_cpu=True)
    off = Engine(m, n_substeps=2, use_spatial=False)
    q, qd, _tau = _batch(m, 2, spread=0.05)
    ctrl = jnp.asarray(np.random.RandomState(3).uniform(
        -1, 1, (q.shape[0], m.nu)).astype(np.float32))
    step = lambda e: jax.jit(jax.vmap(lambda a, b, c: e.step(a, b, c, 5)))
    q_on, qd_on = step(on)(q, qd, ctrl)
    q_off, qd_off = step(off)(q, qd, ctrl)
    np.testing.assert_allclose(np.asarray(q_on), np.asarray(q_off),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(qd_on), np.asarray(qd_off),
                               rtol=1e-2, atol=1e-2)


def test_deep_rollout_stays_finite():
    """200 frames of torque-driven ant on the spatial path stays finite
    and close to the generic path's qpos envelope."""
    m = get_model("ant")
    eng = Engine(m, n_substeps=2, spatial_on_cpu=True)
    rng = np.random.RandomState(4)
    B = 4
    q = jnp.asarray(np.tile(m.init_qpos, (B, 1))
                    + rng.uniform(-0.1, 0.1, (B, m.nv)), jnp.float32)
    qd = jnp.zeros((B, m.nv), jnp.float32)
    ctrls = jnp.asarray(rng.uniform(-1, 1, (200, B, m.nu)).astype(np.float32))

    def roll(q, qd):
        def body(c, ctrl):
            a, b = c
            a, b = jax.vmap(lambda x, y, u: eng.step(x, y, u, 5))(a, b, ctrl)
            return (a, b), None
        (a, b), _ = jax.lax.scan(body, (q, qd), ctrls)
        return a, b
    qf, qdf = jax.jit(roll)(q, qd)
    assert np.all(np.isfinite(np.asarray(qf)))
    assert np.all(np.isfinite(np.asarray(qdf)))
    # torso stays near the ground plane (no energy blowup)
    assert np.abs(np.asarray(qf)[:, 2]).max() < 5.0
