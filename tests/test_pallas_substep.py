"""Pallas substep megakernel: parity vs the single-substep references.

Runs the kernel in TPU-interpret mode on CPU (same strategy as
test_pallas.py); on real TPU the identical trace compiles natively and
is exercised by bench.py's ant/humanoid workloads. Three contracts:

  * the kernel's K-substep chain matches K applications of the spatial
    scalar substep (same trace, so near-bitwise — only the contact
    block's scalar-vs-einsum assembly differs in float order), which in
    turn matches the generic engine substep (tests/test_spatial.py);
  * the scalar contact block (contact_impl="scalar", resurrected for
    the kernel) matches the tensorized one outside any kernel;
  * custom_vmap routing: single/double vmap nesting flattens into one
    kernel batch; the unbatched call falls back to the scan.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from promp_tpu.envs.mujoco import spatial
from promp_tpu.envs.mujoco.engine import Engine
from promp_tpu.envs.mujoco.model import get_model
from promp_tpu.ops.pallas_substep import (make_pallas_chain,
                                          make_vmappable_chain,
                                          pallas_chain_ok)

K = 4


def _batch(m, seed, B=8, spread=0.3):
    key = jax.random.PRNGKey(seed)
    kq, kd, kt = jax.random.split(key, 3)
    q = spread * jax.random.normal(kq, (B, m.nv))
    q = q.at[:, 2].add(0.6)             # root clear of deep penetration
    qd = jax.random.normal(kd, (B, m.nv))
    tau = 0.5 * jax.random.normal(kt, (B, m.nv))
    return q, qd, tau


def _ref_chain(eng, q, qd, tau, n_steps):
    sub = spatial.make_spatial_substep(eng)
    h = jnp.asarray(eng.model.timestep / eng.n_substeps, jnp.float32)

    def body(c, _):
        qq, qdd = c
        return jax.vmap(lambda a, b, t: sub(a, b, t, h, None))(
            qq, qdd, tau), None

    (qq, qdd), _ = jax.lax.scan(body, (q, qd), None, length=n_steps)
    return qq, qdd


@pytest.mark.parametrize("name", ["ant", "humanoid"])
def test_scalar_contacts_match_tensor(name):
    m = get_model(name)
    eng = Engine(m, n_substeps=2)
    sub_t = spatial.make_spatial_substep(eng, contact_impl="tensor")
    sub_s = spatial.make_spatial_substep(eng, contact_impl="scalar")
    q, qd, tau = _batch(m, 0)
    h = jnp.asarray(m.timestep / 2, jnp.float32)
    qt, qdt = jax.vmap(lambda a, b, t: sub_t(a, b, t, h, None))(q, qd, tau)
    qs, qds = jax.vmap(lambda a, b, t: sub_s(a, b, t, h, None))(q, qd, tau)
    np.testing.assert_allclose(np.asarray(qs), np.asarray(qt),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(qds), np.asarray(qdt),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("name", ["ant", "humanoid", "half_cheetah",
                                  "hopper", "walker2d"])
def test_kernel_matches_substep_chain(name):
    m = get_model(name)
    eng = Engine(m, n_substeps=2)
    assert pallas_chain_ok(eng)
    chain = make_pallas_chain(eng, K, tile=128, interpret=True)
    q, qd, tau = _batch(m, 1)
    qk, qdk = chain(q, qd, tau)
    qr, qdr = jax.jit(lambda a, b, t: _ref_chain(eng, a, b, t, K))(q, qd,
                                                                   tau)
    assert bool(jnp.all(jnp.isfinite(qk)) & jnp.all(jnp.isfinite(qdk)))
    np.testing.assert_allclose(np.asarray(qk), np.asarray(qr),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(qdk), np.asarray(qdr),
                               rtol=1e-3, atol=1e-3)


def test_custom_vmap_routing():
    m = get_model("ant")
    eng = Engine(m, n_substeps=2)
    chain = make_vmappable_chain(eng, K, tile=128, interpret=True)
    n_tasks, n_envs = 3, 4
    q, qd, tau = _batch(m, 2, B=n_tasks * n_envs)
    r = lambda x: x.reshape(n_tasks, n_envs, m.nv)

    # double vmap (the rollout's (task, env) nesting) -> one kernel batch
    qn, qdn = jax.vmap(jax.vmap(chain))(r(q), r(qd), r(tau))
    # single vmap over the flattened batch
    qf, qdf = jax.vmap(chain)(q, qd, tau)
    np.testing.assert_allclose(np.asarray(qn.reshape(q.shape)),
                               np.asarray(qf), rtol=1e-6, atol=1e-7)

    # kernel output matches the reference chain
    qr, qdr = jax.jit(lambda a, b, t: _ref_chain(eng, a, b, t, K))(q, qd,
                                                                   tau)
    np.testing.assert_allclose(np.asarray(qf), np.asarray(qr),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(qdf), np.asarray(qdr),
                               rtol=1e-3, atol=1e-3)

    # unbatched fallback: the plain spatial-substep scan, no kernel
    q1, qd1, tau1 = q[0], qd[0], tau[0]
    qs, qds = jax.jit(chain)(q1, qd1, tau1)
    np.testing.assert_allclose(np.asarray(qs), np.asarray(qr[0]),
                               rtol=1e-4, atol=1e-5)


def test_engine_gate_off_on_cpu():
    # the engine must NOT auto-select the Mosaic kernel on the CPU
    # backend (tests run here); direct construction remains available
    eng = Engine(get_model("ant"), n_substeps=2)
    assert eng._pallas_chain(10) is None


# --------------------------------------------------------- rand-params mods
# The mods-aware chain (make_vmappable_chain_mods): rand-params
# multipliers ride into the kernel as packed per-lane inputs and must
# reproduce the generic engine substep with the same mods dict
# (rand_params.py sampling; engine.substep mods contract).

def _mods_ref_chain(eng, q, qd, tau, mods, n_steps):
    h = jnp.asarray(eng.model.timestep / eng.n_substeps, jnp.float32)

    def one(q, qd, tau, md):
        def body(c, _):
            qq, qdd = c
            return eng.substep(qq, qdd, tau, h, md), None

        (qq, qdd), _ = jax.lax.scan(body, (q, qd), None, length=n_steps)
        return qq, qdd

    return jax.vmap(one)(q, qd, tau, mods)


@pytest.mark.parametrize("name", ["hopper", "walker2d"])
def test_mods_kernel_matches_generic(name):
    from promp_tpu.envs.mujoco.rand_params import sample_param_multipliers
    from promp_tpu.ops.pallas_substep import make_vmappable_chain_mods

    m = get_model(name)
    eng = Engine(m, n_substeps=2)
    B = 6
    mods = sample_param_multipliers(jax.random.PRNGKey(7), m, B, 3.0)
    q, qd, tau = _batch(m, 3, B=B)
    chain = make_vmappable_chain_mods(eng, K, tuple(sorted(mods)),
                                      tile=128, interpret=True)
    qk, qdk = jax.vmap(chain)(q, qd, tau, mods)
    qr, qdr = _mods_ref_chain(eng, q, qd, tau, mods, K)
    np.testing.assert_allclose(np.asarray(qk), np.asarray(qr),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(qdk), np.asarray(qdr),
                               rtol=1e-3, atol=1e-3)

    # unbatched fallback: the spatial-substep scan with the mods dict
    md0 = jax.tree.map(lambda v: v[0], mods)
    qs, qds = jax.jit(chain)(q[0], qd[0], tau[0], md0)
    np.testing.assert_allclose(np.asarray(qs), np.asarray(qr[0]),
                               rtol=1e-4, atol=1e-5)


def test_mods_kernel_task_env_nesting():
    # the rollout's shape: mods batched on the task axis only, q/qd/tau
    # on (task, env) — the env-level vmap broadcasts the mods
    from promp_tpu.envs.mujoco.rand_params import sample_param_multipliers
    from promp_tpu.ops.pallas_substep import make_vmappable_chain_mods

    m = get_model("hopper")
    eng = Engine(m, n_substeps=2)
    n_tasks, n_envs = 2, 3
    mods = sample_param_multipliers(jax.random.PRNGKey(8), m, n_tasks, 3.0)
    q, qd, tau = _batch(m, 4, B=n_tasks * n_envs)
    r = lambda x: x.reshape(n_tasks, n_envs, m.nv)
    chain = make_vmappable_chain_mods(eng, K, tuple(sorted(mods)),
                                      tile=128, interpret=True)
    qn, qdn = jax.vmap(
        lambda qq, qdd, tt, md: jax.vmap(
            lambda a, b, c: chain(a, b, c, md))(qq, qdd, tt))(
        r(q), r(qd), r(tau), mods)
    # reference: replicate mods across the env axis and flatten
    mods_flat = jax.tree.map(
        lambda v: jnp.repeat(v, n_envs, axis=0), mods)
    qr, qdr = _mods_ref_chain(eng, q, qd, tau, mods_flat, K)
    np.testing.assert_allclose(np.asarray(qn.reshape(q.shape)),
                               np.asarray(qr), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(qdn.reshape(qd.shape)),
                               np.asarray(qdr), rtol=1e-3, atol=1e-3)


def test_engine_mods_gate():
    # unsupported mod keys must fall back (chain is None); supported
    # keys build on TPU only (None on the CPU test backend)
    from promp_tpu.ops.pallas_substep import mod_keys_ok
    assert mod_keys_ok(("body_mass", "friction"))
    assert not mod_keys_ok(("geom_size",))
    eng = Engine(get_model("hopper"), n_substeps=2)
    assert eng._pallas_chain(8, ("geom_size",)) is None
    assert eng._pallas_chain(8, ("body_mass",)) is None  # CPU backend
