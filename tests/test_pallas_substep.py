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
