"""Pallas TPU megakernel: fused multi-substep physics chain.

Covers every spatial-eligible body — the 3-D chains (ant, humanoid) it
was built for AND the planar bodies (cheetah, hopper, walker), where it
beats the scalar-unrolled planar XLA path ~2.5x (cheetah physics-only:
13.3M vs 5.4M env-steps/s at batch 800) for the same HBM-traffic reason.

Round 5 measured ant/humanoid as SUBSTEP-BOUND (benchmarks/
profile_step.py: the full env step sits within 12%/6% of the
substeps-only ceiling), and the substep itself as HBM-round-trip bound:
XLA runs each substep of the ``frame_skip * n_substeps`` chain as a
handful of fusions, writing every intermediate back to HBM, and
batch-scaling shows ~30% fixed overhead plus a bandwidth-limited slope.
This kernel runs the ENTIRE chain (all 10 substeps of one env step) in
one Pallas program: ``q``/``qd``/``tau`` are read from HBM once, every
per-dof scalar lives in VMEM/vector registers for the whole chain, and
only the final state is written back — the HBM traffic per env step
drops from every-intermediate to 5 (nv, B) arrays.

The physics body is the SAME trace as the spatial fast path
(envs/mujoco/spatial.py, ``list_io=True``): each dof is a separate
(TILE,)-lane vector, every operation is elementwise VPU math, and the
whole substep is built by the scalar-algebra const-folding machinery.
The contact block uses the fully scalar per-contact form
(``contact_impl="scalar"``): inside a Mosaic-compiled kernel the
program-size concern that forced the XLA path to tensorize (git 790f9d8)
does not apply — XLA sees ONE opaque custom call, so the training
program's autograd/fusion passes never traverse the ~20k-op kernel body.

Integration is transparent to the rollout: ``make_vmappable_chain``
wraps the batched kernel in ``jax.custom_batching.custom_vmap`` so the
existing per-instance ``engine.step`` picks it up under any nesting of
``vmap`` (the rollout's (task, env) axes flatten to the kernel's batch
lanes); unbatched calls fall back to the plain spatial-substep scan.

No VJP is defined: sampling is never differentiated (policy-gradient
algorithms differentiate log-probs recomputed from logged data, not the
env dynamics — the same contract as ops/pallas_rollout.py).

Reference analog: the mujoco-py ``sim.step`` loop inside each worker of
the reference's MetaParallelEnvExecutor (vectorized_env_executor.py);
this is its TPU-resident equivalent.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_chain_ok(engine) -> bool:
    """Static eligibility: the spatial scalar formulation must cover the
    model (spatial.spatial_ok)."""
    from promp_tpu.envs.mujoco import spatial
    return spatial.spatial_ok(engine.model)


# Rand-params multiplier keys the kernel can take as per-lane inputs
# (rand_params.py RAND_PARAMS; shapes per instance). Any other key in a
# mods dict makes the env fall back to the substep scan.
_MOD_BASE_NDIM = {"body_mass": 1, "body_inertia": 2, "dof_damping": 1,
                  "friction": 0}


def mod_keys_ok(mod_keys) -> bool:
    return all(k in _MOD_BASE_NDIM for k in mod_keys)


def _mod_rows(model, key):
    """Packed row count for one mod key."""
    return {"body_mass": model.nb, "body_inertia": 3 * model.nb,
            "dof_damping": model.nv, "friction": 1}[key]


class _Mat:
    """[b, k]-indexable list-of-lists (the substep indexes
    mods['body_inertia'][b, k] with a tuple)."""

    def __init__(self, rows):
        self._rows = rows

    def __getitem__(self, ix):
        b, k = ix
        return self._rows[b][k]


def _pack_mods(model, mod_keys, mods):
    """dict of (B, ...) leaves -> one (B, nm) float32 array, rows in
    mod_keys order."""
    cols = [jnp.asarray(mods[k], jnp.float32).reshape(
                mods[k].shape[0], -1) for k in mod_keys]
    return jnp.concatenate(cols, axis=1)


def _unpack_mods_rows(model, mod_keys, row):
    """row(i) -> (tile,) lane vector for packed row i; rebuild the mods
    dict of per-lane scalars the substep trace consumes."""
    nb, nv = model.nb, model.nv
    d, off = {}, 0
    for k in mod_keys:
        if k == "body_mass":
            d[k] = [row(off + b) for b in range(nb)]
        elif k == "body_inertia":
            d[k] = _Mat([[row(off + 3 * b + c) for c in range(3)]
                         for b in range(nb)])
        elif k == "dof_damping":
            d[k] = [row(off + j) for j in range(nv)]
        elif k == "friction":
            d[k] = row(off)
        off += _mod_rows(model, k)
    return d


def make_pallas_chain(engine, n_steps, tile=1024, interpret=False,
                      mod_keys=()):
    """Build the batched K-substep chain kernel.

    Returns ``chain(q, qd, tau) -> (q2, qd2)`` over ``(B, nv)`` arrays:
    ``n_steps`` implicit-Euler substeps with the actuation torque held
    fixed (exactly ``engine.step``'s scan, engine.py:692-698). Batch is
    padded to a multiple of ``tile`` lanes; each grid step owns one
    (nv, tile) block resident in VMEM.

    With ``mod_keys`` (sorted tuple of rand-params multiplier names,
    rand_params.py RAND_PARAMS), the chain takes a fourth ``(B, nm)``
    packed-mods argument (``_pack_mods``): each multiplier becomes one
    more VMEM-resident lane vector and the substep trace multiplies it
    into the otherwise const-folded model constants — per-task physics
    without leaving the kernel.
    """
    from promp_tpu.envs.mujoco import spatial

    m = engine.model
    nv = m.nv
    sub = spatial.make_spatial_substep(engine, contact_impl="scalar",
                                       list_io=True)
    h = float(m.timestep / engine.n_substeps)
    nm = sum(_mod_rows(m, k) for k in mod_keys)

    def kernel(*refs):
        if mod_keys:
            q_ref, qd_ref, tau_ref, mod_ref, qo_ref, qdo_ref = refs
            mods = _unpack_mods_rows(m, mod_keys, lambda i: mod_ref[i, :])
        else:
            q_ref, qd_ref, tau_ref, qo_ref, qdo_ref = refs
            mods = None
        qs = [q_ref[j, :] for j in range(nv)]
        qds = [qd_ref[j, :] for j in range(nv)]
        taus = [tau_ref[j, :] for j in range(nv)]

        def body(_, carry):
            qs, qds = carry
            q2, qd2 = sub(qs, qds, taus, h, mods)
            return (q2, qd2)

        qs, qds = jax.lax.fori_loop(0, n_steps, body, (qs, qds),
                                    unroll=False)
        for j in range(nv):
            qo_ref[j, :] = qs[j]
            qdo_ref[j, :] = qds[j]

    @jax.jit
    def chain(q, qd, tau, mods_packed=None):
        B = q.shape[0]
        # shrink the tile for small batches (validation runs) so padding
        # stays <=127 lanes; tile=1024 fills all 8 VPU sublanes per op
        # at the benchmark batch (measured: ant 375 -> 534k env-steps/s
        # over tile=256)
        tile_e = min(tile, -(-B // 128) * 128)
        spec = pl.BlockSpec((nv, tile_e), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        Bp = -(-B // tile_e) * tile_e
        pad = [(0, Bp - B)]

        def prep(x):
            # (B, rows) -> (rows, Bp): scalars on sublanes, batch lanes
            return jnp.pad(x.T, [(0, 0)] + pad)

        ins = [prep(q), prep(qd), prep(tau)]
        in_specs = [spec] * 3
        if mod_keys:
            ins.append(prep(mods_packed))
            in_specs.append(pl.BlockSpec((nm, tile_e), lambda i: (0, i),
                                         memory_space=pltpu.VMEM))
        qo, qdo = pl.pallas_call(
            kernel,
            grid=(Bp // tile_e,),
            in_specs=in_specs,
            out_specs=[spec] * 2,
            out_shape=[jax.ShapeDtypeStruct((nv, Bp), q.dtype)] * 2,
            interpret=pltpu.InterpretParams() if interpret else False,
        )(*ins)
        return qo[:, :B].T, qdo[:, :B].T

    return chain


def make_vmappable_chain(engine, n_steps, tile=1024, interpret=False):
    """Per-instance ``(q, qd, tau) -> (q2, qd2)`` that routes to the
    Pallas megakernel under ``vmap`` (any nesting depth — the rollout's
    (task, env) axes flatten into kernel batch lanes) and to the plain
    spatial-substep scan when called unbatched (e.g. single-rollout
    rendering)."""
    from promp_tpu.envs.mujoco import spatial

    batched = make_pallas_chain(engine, n_steps, tile=tile,
                                interpret=interpret)
    sub = spatial.make_spatial_substep(engine)
    h = jnp.asarray(float(engine.model.timestep / engine.n_substeps),
                    engine.dtype)

    def _bcast(axis_size, in_batched, args):
        return tuple(a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
                     for a, b in zip(args, in_batched))

    @jax.custom_batching.custom_vmap
    def flat(q, qd, tau):
        # (B, nv): the batched entry — unbatched call = the kernel itself
        return batched(q, qd, tau)

    @flat.def_vmap
    def flat_rule(axis_size, in_batched, q, qd, tau):
        # an extra leading axis on an already-batched call: flatten it
        # into the kernel batch and recurse (each vmap layer peels once)
        q, qd, tau = _bcast(axis_size, in_batched, (q, qd, tau))
        shp = q.shape
        qo, qdo = flat(q.reshape(-1, shp[-1]), qd.reshape(-1, shp[-1]),
                       tau.reshape(-1, shp[-1]))
        return (qo.reshape(shp), qdo.reshape(shp)), (True, True)

    @jax.custom_batching.custom_vmap
    def single(q, qd, tau):
        # unbatched fallback: the spatial-substep scan (engine.step form)
        def body(carry, _):
            q, qd = carry
            return sub(q, qd, tau, h, None), None

        (q, qd), _ = jax.lax.scan(body, (q, qd), None, length=n_steps)
        return q, qd

    @single.def_vmap
    def single_rule(axis_size, in_batched, q, qd, tau):
        q, qd, tau = _bcast(axis_size, in_batched, (q, qd, tau))
        return flat(q, qd, tau), (True, True)

    return single


def make_vmappable_chain_mods(engine, n_steps, mod_keys, tile=1024,
                              interpret=False):
    """Mods-aware sibling of ``make_vmappable_chain``: per-instance
    ``(q, qd, tau, mods) -> (q2, qd2)`` where ``mods`` is a rand-params
    multiplier dict (rand_params.py shapes per instance). Under vmap the
    task axis batches the mods; the env axis broadcasts them — both
    flatten into kernel batch lanes with the multipliers packed as extra
    VMEM lane vectors. Unbatched calls fall back to the spatial-substep
    scan with the same mods dict."""
    from promp_tpu.envs.mujoco import spatial

    m = engine.model
    mod_keys = tuple(mod_keys)
    batched = make_pallas_chain(engine, n_steps, tile=tile,
                                interpret=interpret, mod_keys=mod_keys)
    sub = spatial.make_spatial_substep(engine)
    h = jnp.asarray(float(m.timestep / engine.n_substeps), engine.dtype)

    def _bc(a, b, axis_size):
        return a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)

    def _bc_mods(mods, mb, axis_size):
        return {k: _bc(v, mb[k], axis_size) for k, v in mods.items()}

    @jax.custom_batching.custom_vmap
    def flat(q, qd, tau, mods):
        # (B, ...) batched entry — the kernel itself
        return batched(q, qd, tau, _pack_mods(m, mod_keys, mods))

    @flat.def_vmap
    def flat_rule(axis_size, in_batched, q, qd, tau, mods):
        # an extra leading axis on an already-batched call: flatten it
        # into the kernel batch and recurse (each vmap layer peels once)
        q = _bc(q, in_batched[0], axis_size)
        qd = _bc(qd, in_batched[1], axis_size)
        tau = _bc(tau, in_batched[2], axis_size)
        mods = _bc_mods(mods, in_batched[3], axis_size)
        shp = q.shape
        fmods = {k: v.reshape((-1,) + v.shape[v.ndim - _MOD_BASE_NDIM[k]:])
                 for k, v in mods.items()}
        qo, qdo = flat(q.reshape(-1, shp[-1]), qd.reshape(-1, shp[-1]),
                       tau.reshape(-1, shp[-1]), fmods)
        return (qo.reshape(shp), qdo.reshape(shp)), (True, True)

    @jax.custom_batching.custom_vmap
    def single(q, qd, tau, mods):
        # unbatched fallback: the spatial-substep scan (engine.step form)
        def body(carry, _):
            q, qd = carry
            return sub(q, qd, tau, h, mods), None

        (q, qd), _ = jax.lax.scan(body, (q, qd), None, length=n_steps)
        return q, qd

    @single.def_vmap
    def single_rule(axis_size, in_batched, q, qd, tau, mods):
        q = _bc(q, in_batched[0], axis_size)
        qd = _bc(qd, in_batched[1], axis_size)
        tau = _bc(tau, in_batched[2], axis_size)
        mods = _bc_mods(mods, in_batched[3], axis_size)
        return flat(q, qd, tau, mods), (True, True)

    return single
