"""Scalar-unrolled planar dynamics fast path (cheetah / walker / hopper).

The gymnasium planar locomotion models are kinematic chains whose every
hinge is about the world y-axis and whose bodies never leave the x-z
plane. On TPU the generic engine (engine.py) pays heavily for this
generality: its (B, nb, 3, nv) Jacobian/inertia tensors pad the tiny
minor dimensions onto (8, 128) tiles, its (B, nv, nv) mass matrix is
materialized and then sliced entry-by-entry by the unrolled solver, and
the profiler shows the substep dominated by layout copies and strided
slice fusions rather than math.

This module is the TPU-shaped formulation: ALL per-substep quantities are
kept as individual scalars (under ``vmap``: (batch,) lanes-resident
vectors), with every structural loop — kinematic tree, ancestor dof
lists, mass-matrix entry accumulation, contact columns, the Cholesky
solve — unrolled at TRACE time from the static model. The whole substep
compiles to a handful of fused elementwise kernels over the env batch:
no padded tensors, no matrix materialization, no slicing. Exactly the
VMEM-locality program a hand-written Pallas megakernel would express,
obtained through XLA fusion.

Planar reductions used (hinge axis = ±y, so rotations are 2-D in (x, z)):

  * R_y(t)·(x, z) = (c·x + s·z, −s·x + c·z)
  * hinge Jacobian column for point P about anchor A:
    s·(ŷ×(P−A)) = s·(P_z−A_z, −(P_x−A_x))
  * world inertia about ŷ is CONSTANT per body:
    I_yy = ŷᵀ R_i diag(I) R_iᵀ ŷ (R_y fixes ŷ) — precomputed, with the
    rand-params inertia multipliers entering through the per-component
    coefficients c_k = (R_i)_{y k}² I_k
  * gyroscopic torque ω×(Iω) has no in-plane component (ω ∥ ŷ), so the
    planar Newton-Euler bias pass needs no inertia coupling terms

Semantic parity with the generic substep is pinned by
tests/test_planar.py (random states, every planar model, atol~1e-4 —
float32 reassociation only). Reference analog: mujoco's mj_step on the
same MJCFs (half_cheetah.xml etc.), reached through the engine-level
MuJoCo-parity tests.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from promp_tpu.envs.mujoco.model import HINGE
from promp_tpu.ops.smallsolve import solve_from_entries

__all__ = ["planar_ok", "make_planar_substep"]


def planar_ok(model) -> bool:
    """Static eligibility: x-z planar chain, hinges about ±y, no free
    root, no fluid medium, no sphere-sphere pairs."""
    if model.free_dof_start != -1:
        return False
    if model.density != 0.0 or model.viscosity != 0.0:
        return False
    if len(model.pair_a) or len(model.pair_b):
        return False
    if len(model.con_skip_ground) and any(model.con_skip_ground):
        return False
    q = np.asarray(model.body_quat)
    if np.abs(q - np.array([1.0, 0, 0, 0])).max() > 1e-9:
        return False
    ax = np.asarray(model.jnt_axis)
    for j, t in enumerate(model.jnt_type):
        if t == HINGE:
            if abs(abs(ax[j, 1]) - 1.0) > 1e-9 or np.abs(
                    ax[j, [0, 2]]).max() > 1e-9:
                return False
        else:  # SLIDE must stay in-plane
            if abs(ax[j, 1]) > 1e-9:
                return False
    return True


def _rot(c, s, x, z):
    """R_y(t)·(x, z) with c = cos t, s = sin t."""
    return c * x + s * z, -s * x + c * z


def make_planar_substep(engine):
    """Build the scalar-unrolled substep for ``engine``'s (planar) model.

    Returns ``substep(q, qd, tau_act, h, mods) -> (q_new, qd_new)`` with
    the same contract as ``Engine.substep``. All model structure is
    resolved to Python loops here, once, at trace time.
    """
    m = engine.model
    nv, nb, nc = m.nv, m.nb, len(m.con_body)

    # ---- static structure (numpy, trace-time only)
    dofs_of_body = [[] for _ in range(nb)]
    for j, b in enumerate(m.jnt_body):
        dofs_of_body[b].append(j)
    # ancestor dofs per body, in tree order (root slides first)
    anc_dofs = []
    for b in range(nb):
        chain = []
        cur = b
        while cur >= 0:
            chain.append(cur)
            cur = m.body_parent[cur]
        dofs = []
        for cb in reversed(chain):
            dofs.extend(dofs_of_body[cb])
        anc_dofs.append(dofs)

    jnt_axis = np.asarray(m.jnt_axis, np.float64)
    hinge_sign = [float(jnt_axis[j, 1]) for j in range(nv)]
    slide_ax = [(float(jnt_axis[j, 0]), float(jnt_axis[j, 2]))
                for j in range(nv)]
    is_hinge = [t == HINGE for t in m.jnt_type]
    ref = [float(r) for r in np.asarray(m.jnt_ref, np.float64)]
    body_off = np.asarray(m.body_pos, np.float64)
    jnt_off = np.asarray(m.jnt_pos, np.float64)
    ipos = np.asarray(m.body_ipos, np.float64)
    con_pos = np.asarray(m.con_pos, np.float64)
    con_radius = [float(r) for r in np.asarray(m.con_radius, np.float64)]
    con_body = list(m.con_body)

    # world inertia about y per body: I_yy = sum_k (R_i)_{yk}^2 I_k;
    # keep the per-component coefficients so body_inertia multiplier
    # tasks (rand-params) flow through exactly like the generic engine.
    def _np_quat_row_y(qt):
        w, x, y, z = [float(v) for v in qt]
        return np.array([2 * (x * y + w * z),
                         1 - 2 * (x * x + z * z),
                         2 * (y * z - w * x)], np.float64)

    iyy_coeff = [_np_quat_row_y(m.body_iquat[b]) ** 2 for b in range(nb)]

    limited = [(abs(m.jnt_range[j, 0]) + abs(m.jnt_range[j, 1])) > 0
               for j in range(nv)]
    jr_lo = [float(v) for v in np.asarray(m.jnt_range[:, 0], np.float64)]
    jr_hi = [float(v) for v in np.asarray(m.jnt_range[:, 1], np.float64)]
    stiffness = [float(v) for v in np.asarray(m.jnt_stiffness, np.float64)]
    springref = [float(v) for v in np.asarray(m.jnt_springref, np.float64)]
    armature = [float(v) for v in np.asarray(m.dof_armature, np.float64)]

    k_con = engine.contact_stiffness
    c_con = engine.contact_damping
    ct_max = engine.contact_tangential_damping
    k_lim = engine.limit_stiffness
    c_lim = engine.limit_damping

    def substep(q, qd, tau_act, h, mods=None):
        def mod1(name, idx, base):
            if mods and name in mods:
                return base * mods[name][idx]
            return base

        qs = [q[j] for j in range(nv)]
        qds = [qd[j] for j in range(nv)]
        zero = jnp.zeros_like(qs[0])

        mass = [mod1("body_mass", b, float(m.body_mass[b]))
                for b in range(nb)]
        if mods and "body_inertia" in mods:
            iyy = [iyy_coeff[b][0] * m.body_inertia[b][0]
                   * mods["body_inertia"][b][0]
                   + iyy_coeff[b][1] * m.body_inertia[b][1]
                   * mods["body_inertia"][b][1]
                   + iyy_coeff[b][2] * m.body_inertia[b][2]
                   * mods["body_inertia"][b][2] for b in range(nb)]
        else:
            iyy = [float(np.dot(iyy_coeff[b], m.body_inertia[b]))
                   for b in range(nb)]
        damping = [mod1("dof_damping", j, float(m.dof_damping[j]))
                   for j in range(nv)]
        friction = (mods["friction"] * m.friction
                    if mods and "friction" in mods else m.friction)

        # ---------------------------------------------------- planar FK
        # per body: theta (about +y), origin (px, pz); per dof: jacobian
        # generators (hinge: sign + anchor; slide: world axis 2D)
        theta = [None] * nb
        px = [None] * nb
        pz = [None] * nb
        dof_kind = [None] * nv       # ('h', sign, ax, az) | ('s', wx, wz)
        for b in range(nb):
            pa = m.body_parent[b]
            if pa < 0:
                th = zero
                x, z = zero + body_off[b, 0], zero + body_off[b, 2]
            else:
                th = theta[pa]
                c, s = jnp.cos(th), jnp.sin(th)
                dx, dz = _rot(c, s, body_off[b, 0], body_off[b, 2])
                x, z = px[pa] + dx, pz[pa] + dz
            for j in dofs_of_body[b]:
                c, s = jnp.cos(th), jnp.sin(th)
                if not is_hinge[j]:
                    wx, wz = _rot(c, s, *slide_ax[j])
                    dof_kind[j] = ("s", wx, wz)
                    dq = qs[j] - ref[j]
                    x, z = x + wx * dq, z + wz * dq
                else:
                    ax_, az_ = _rot(c, s, jnt_off[j, 0], jnt_off[j, 2])
                    ax_, az_ = x + ax_, z + az_
                    sgn = hinge_sign[j]
                    dq = sgn * (qs[j] - ref[j])
                    cd, sd = jnp.cos(dq), jnp.sin(dq)
                    rx, rz = x - ax_, z - az_
                    nx, nz = _rot(cd, sd, rx, rz)
                    x, z = ax_ + nx, az_ + nz
                    th = th + dq
                    dof_kind[j] = ("h", sgn, ax_, az_)
            theta[b], px[b], pz[b] = th, x, z

        cth = [jnp.cos(theta[b]) for b in range(nb)]
        sth = [jnp.sin(theta[b]) for b in range(nb)]
        comx = [None] * nb
        comz = [None] * nb
        for b in range(nb):
            dx, dz = _rot(cth[b], sth[b], ipos[b, 0], ipos[b, 2])
            comx[b], comz[b] = px[b] + dx, pz[b] + dz

        def jac_cols(P_x, P_z, dofs):
            """[(j, col_x, col_z)] for a point attached below dofs."""
            cols = []
            for j in dofs:
                kind = dof_kind[j]
                if kind[0] == "s":
                    cols.append((j, kind[1], kind[2]))
                else:
                    _, sgn, ax_, az_ = kind
                    cols.append((j, sgn * (P_z - az_), -sgn * (P_x - ax_)))
            return cols

        body_jp = [jac_cols(comx[b], comz[b], anc_dofs[b])
                   for b in range(nb)]

        # ------------------------------------------------- mass matrix
        # M[i][j] scalars, i >= j (lower triangle)
        M = [[zero for _ in range(i + 1)] for i in range(nv)]
        for b in range(nb):
            cols = body_jp[b]
            omg = [(j, hinge_sign[j]) for j in anc_dofs[b] if is_hinge[j]]
            for a in range(len(cols)):
                ja, xa, za = cols[a]
                for bidx in range(a + 1):
                    jb, xb, zb = cols[bidx]
                    hi_, lo_ = max(ja, jb), min(ja, jb)
                    M[hi_][lo_] = M[hi_][lo_] + mass[b] * (
                        xa * xb + za * zb)
            for a in range(len(omg)):
                ja, sa = omg[a]
                for bidx in range(a + 1):
                    jb, sb = omg[bidx]
                    hi_, lo_ = max(ja, jb), min(ja, jb)
                    M[hi_][lo_] = M[hi_][lo_] + iyy[b] * sa * sb
        for j in range(nv):
            M[j][j] = M[j][j] + armature[j]

        # ------------------------------------- bias (planar RNEA, qdd=0)
        # motion vectors (w, vx, vz) in world Pluecker at origin
        Sw = [None] * nv
        Svx = [None] * nv
        Svz = [None] * nv
        for j in range(nv):
            kind = dof_kind[j]
            if kind[0] == "s":
                Sw[j], Svx[j], Svz[j] = zero, kind[1], kind[2]
            else:
                _, sgn, ax_, az_ = kind
                # v_O = s*(y_hat x (O - A)) = s*(-A_z, A_x)
                Sw[j] = zero + sgn
                Svx[j], Svz[j] = -sgn * az_, sgn * ax_

        def cross_motion(w1, x1, z1, w2, x2, z2):
            # planar motion cross product: w-part vanishes (both about y)
            return (zero,
                    w1 * z2 - w2 * z1,
                    -(w1 * x2 - w2 * x1))

        # per-dof velocity-below-j and Sdot*qd
        dof_body = list(m.jnt_body)
        Vw = [zero] * nb
        Vx = [zero] * nb
        Vz = [zero] * nb
        Aw = [zero] * nb
        Ax = [zero] * nb
        Az = [zero] * nb
        g = m.gravity
        for b in range(nb):
            pa = m.body_parent[b]
            vw = Vw[pa] if pa >= 0 else zero
            vx = Vx[pa] if pa >= 0 else zero
            vz = Vz[pa] if pa >= 0 else zero
            aw = Aw[pa] if pa >= 0 else zero
            ax_ = Ax[pa] if pa >= 0 else zero
            az_ = Az[pa] if pa >= 0 else zero - g   # base accel = -a_gravity
            for j in dofs_of_body[b]:
                # Sdot_j = V_before_j x S_j ; accumulated with qd_j
                _, dx, dz = cross_motion(vw, vx, vz, Sw[j], Svx[j], Svz[j])
                aw = aw  # w-part of Sdot is zero in-plane
                ax_ = ax_ + dx * qds[j]
                az_ = az_ + dz * qds[j]
                vw = vw + Sw[j] * qds[j]
                vx = vx + Svx[j] * qds[j]
                vz = vz + Svz[j] * qds[j]
            Vw[b], Vx[b], Vz[b] = vw, vx, vz
            Aw[b], Ax[b], Az[b] = aw, ax_, az_

        # body forces F_b = I A_b + V x* (I V_b) about the origin
        Fw = [None] * nb
        Fx = [None] * nb
        Fz = [None] * nb
        for b in range(nb):
            cx, cz = comx[b], comz[b]

            def inertia_apply(w, vx_, vz_):
                # v_com = v_O + w x c ; (y x c) = (c_z, -c_x)
                vcx = vx_ + w * cz
                vcz = vz_ - w * cx
                fx = mass[b] * vcx
                fz = mass[b] * vcz
                # n_y = I_yy w + (c x f)_y = I w + c_z f_x - c_x f_z
                n = iyy[b] * w + cz * fx - cx * fz
                return n, fx, fz

            n_a, fx_a, fz_a = inertia_apply(Aw[b], Ax[b], Az[b])
            n_v, fx_v, fz_v = inertia_apply(Vw[b], Vx[b], Vz[b])
            # V x* F: n_out = (v x f)_y = v_z f_x - v_x f_z ; f_out = w*(y x f)
            Fw[b] = n_a + (Vz[b] * fx_v - Vx[b] * fz_v)
            Fx[b] = fx_a + Vw[b] * fz_v
            Fz[b] = fz_a - Vw[b] * fx_v

        # subtree sums: tau_bias_j = S_j . sum_{b in subtree(j)} F_b
        sub_w = [zero] * nv
        sub_x = [zero] * nv
        sub_z = [zero] * nv
        for b in range(nb):
            for j in anc_dofs[b]:
                sub_w[j] = sub_w[j] + Fw[b]
                sub_x[j] = sub_x[j] + Fx[b]
                sub_z[j] = sub_z[j] + Fz[b]
        bias = [Sw[j] * sub_w[j] + Svx[j] * sub_x[j] + Svz[j] * sub_z[j]
                for j in range(nv)]

        # ------------------------------------------------------ contacts
        tau_con = [zero] * nv
        # A_con entries accumulate into the same lower triangle as M
        Acon = [[zero for _ in range(i + 1)] for i in range(nv)]
        for ci in range(nc):
            b = con_body[ci]
            dx, dz = _rot(cth[b], sth[b], con_pos[ci, 0], con_pos[ci, 2])
            Px, Pz = px[b] + dx, pz[b] + dz
            cols = jac_cols(Px, Pz, anc_dofs[b])
            # contact-point velocity
            vx = zero
            vz = zero
            for j, cxj, czj in cols:
                vx = vx + cxj * qds[j]
                vz = vz + czj * qds[j]
            phi = Pz - con_radius[ci]
            in_con = (phi < 0.0).astype(q.dtype)
            fn = jnp.maximum(k_con * (-phi) - c_con * vz, 0.0) * in_con
            vt_norm = jnp.sqrt(vx * vx + 1e-8)
            ct_eff = jnp.minimum(ct_max, friction * fn / vt_norm) * in_con
            ft = -ct_eff * vx
            active = in_con * (fn > 0.0)
            cn_eff = c_con * active
            kn_eff = k_con * active
            # tau += J^T f  and the RHS mate of the implicit h^2 K term
            rhs_n = h * kn_eff * vz
            for j, cxj, czj in cols:
                tau_con[j] = tau_con[j] + cxj * ft + czj * (fn - rhs_n)
            # A += h ct Jx Jx^T + (h cn + h^2 kn) Jz Jz^T
            wn = h * cn_eff + h * h * kn_eff
            wt = h * ct_eff
            for a in range(len(cols)):
                ja, xa, za = cols[a]
                for bi in range(a + 1):
                    jb, xb, zb = cols[bi]
                    hi_, lo_ = max(ja, jb), min(ja, jb)
                    Acon[hi_][lo_] = (Acon[hi_][lo_]
                                      + wt * xa * xb + wn * za * zb)

        # --------------------------------- limits / springs / damping
        tau = [None] * nv
        diag_cd = [None] * nv
        for j in range(nv):
            tj = tau_act[j] - bias[j] + tau_con[j]
            c_l = zero
            k_l = zero
            if limited[j]:
                below = jnp.minimum(qs[j] - jr_lo[j], 0.0)
                above = jnp.maximum(qs[j] - jr_hi[j], 0.0)
                viol = below + above
                active = (jnp.abs(viol) > 0).astype(q.dtype)
                tj = tj - k_lim * viol - c_lim * qds[j] * active
                c_l = c_lim * active
                k_l = k_lim * active
            if stiffness[j] != 0.0:
                tj = tj - stiffness[j] * (qs[j] - springref[j])
            tj = tj - damping[j] * qds[j]
            # consistent implicit Euler RHS for position-stiffness terms
            tj = tj - h * (k_l + stiffness[j]) * qds[j]
            diag_cd[j] = h * (damping[j] + c_l) + h * h * (
                k_l + stiffness[j])
            tau[j] = tj

        # ------------------------------------------- regularized solve
        tr = M[0][0]
        for j in range(1, nv):
            tr = tr + M[j][j]
        reg = engine.solve_reg * (tr / nv)

        def a_entry(i, j):
            lo_, hi_ = min(i, j), max(i, j)
            e = M[hi_][lo_] + Acon[hi_][lo_]
            if i == j:
                e = e + diag_cd[i] + reg
            return e

        qdd = solve_from_entries(a_entry, lambda i: tau[i], nv)

        qd_new = jnp.stack([
            jnp.clip(qds[j] + h * qdd[j], -engine.max_qvel, engine.max_qvel)
            for j in range(nv)])
        q_new = jnp.stack([qs[j] + h * qd_new[j] for j in range(nv)])
        return q_new, qd_new

    return substep
