"""JAX-native articulated rigid-body dynamics (generalized coordinates).

TPU-native physics for the locomotion meta-envs, replacing the reference's
CPython-bound MuJoCo (SURVEY.md §2.9 P6). MJX is unavailable in this stack,
so this is a from-scratch engine built for the jit/vmap execution model:

  * forward kinematics over a fixed kinematic tree (unrolled, static)
  * mass matrix from geometric body Jacobians:
        M(q) = sum_b m_b Jp_b^T Jp_b + Jr_b^T R I R^T Jr_b  (+ armature)
  * Coriolis/centrifugal bias via AUTODIFF of the kinetic energy
    (tau_c = Mdot(q) qdot - 1/2 d/dq [qdot^T M qdot]) and gravity via the
    potential's gradient — no hand-derived dynamics, exact to machine eps
  * ground contact as smooth penalty springs on contact spheres with
    friction-cone-clamped tangential damping (plane z=0)
  * joint-limit penalty springs; per-dof linear damping handled implicitly
    in the integrator (the (M + h D) solve mirrors MuJoCo's Euler
    integrator's implicit joint damping)
  * MuJoCo's inertia-box fluid model (viscous + quadratic density drag;
    the swimmer's medium), validated against qfrc_passive

Everything is a pure function of (q, qd, ctrl) and static model arrays, so
whole-rollout scans fuse policy + physics into one XLA computation, batched
over thousands of (task, env) instances.

Semi-implicit Euler at the MJCF timestep with optional substeps; contact
stiffness defaults give cheetah/walker/hopper-class stability at
h = timestep as shipped in the gymnasium MJCFs.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from promp_tpu.envs.mujoco.model import HINGE, SLIDE, ChainModel
from promp_tpu.envs.mujoco.rotations import (
    quat_from_axis_angle, quat_mul, quat_rotate, quat_to_mat)
from promp_tpu.ops.smallsolve import chol_solve_cols, chol_solve_unrolled

_UNSET = object()


@dataclass(frozen=True)
class Engine:
    model: ChainModel
    n_substeps: int = 1
    contact_stiffness: float = 1.0e4
    contact_damping: float = 1.0e2
    contact_tangential_damping: float = 2.0e2
    limit_stiffness: float = 4.0e3
    limit_damping: float = 20.0
    # hard cap on joint velocities: keeps extreme-torque excursions finite
    # so a diverging env instance cannot poison a whole rollout batch with
    # NaNs (MuJoCo's constraint solver implicitly bounds these; real
    # locomotion qvel stays well under ~30, and legitimate tumbling
    # transients under extreme exploration torques stay under ~300 — the
    # cap is set well above both so it only fires on genuine divergence)
    max_qvel: float = 3.0e2
    # relative Tikhonov regularization of the (M + hD) solve. The free-root
    # Euler decomposition (3 hinges) makes M exactly singular at gimbal
    # lock (pitch = +-pi/2) — a flipped ant/humanoid — where a float32
    # Cholesky returns NaN and permanently poisons never-done envs. The
    # reg is a tiny virtual armature ~1e-5 * mean diag(M); legit
    # eigenvalues are O(1), so dynamics error is O(1e-5) relative.
    solve_reg: float = 1.0e-5
    dtype: type = jnp.float32
    # scalar-unrolled planar fast path (envs/mujoco/planar.py) for
    # eligible models (x-z chains, hinges about ±y: cheetah / walker /
    # hopper). Equivalent to the generic substep to float32 precision
    # (tests/test_planar.py); set False to force the generic path.
    use_planar: bool = True
    # scalar-unrolled 3-D fast path (envs/mujoco/spatial.py) for the
    # non-planar bodies. Planar wins where eligible; set False to force
    # the generic tensor path. Gated by nv: at ant size (nv=14) the
    # scalar program wins 3.1x (325 vs 991 us/substep, batch 800), but
    # at humanoid size (nv=23, ~26k scalar ops) it RUNS SLOWER than the
    # generic path with the column-unrolled solver (811 vs 724 us) and
    # costs a 24-minute XLA compile — measured round 5, RESULTS.md.
    use_spatial: bool = True
    spatial_max_nv: int = 16
    # XLA:CPU's optimizer miscompiles the large scalar program for some
    # states (round-5 finding: jit output NaN while jax_debug_nans'
    # de-optimized replay of the SAME program is finite, and the TPU
    # compile of the same state is finite and bit-identical to eager) —
    # so the fast path is not auto-selected on the CPU backend. Parity
    # tests construct the substep directly and can opt back in here.
    spatial_on_cpu: bool = False
    # Pallas substep megakernel (ops/pallas_substep.py): the whole
    # frame_skip x n_substeps chain of one env step runs as ONE Mosaic
    # program with every per-dof scalar VMEM-resident — q/qd/tau are
    # read from HBM once per env step instead of once per XLA fusion
    # per substep. TPU only (Mosaic); picked up transparently under
    # vmap via custom_vmap, per-instance calls fall back to the scan.
    # Physics-mods calls (rand-params envs) bypass it at the call site.
    # Preferred over BOTH fallback formulations when eligible: on the
    # planar bodies it beats the planar XLA path ~2.5x (cheetah
    # physics-only 13.3M vs 5.4M env-steps/s at batch 800).
    use_pallas_substep: bool = True
    pallas_substep_tile: int = 1024

    # ------------------------------------------------------------------- fk
    def fk(self, q):
        """Forward kinematics.

        Returns dict with body world frames and per-dof world axes/anchors:
          body_pos (nb,3), body_quat (nb,4), com (nb,3),
          dof_axis (nv,3), dof_anchor (nv,3).
        """
        m = self.model
        dt = self.dtype
        ref = m.jnt_ref
        body_pos_w, body_quat_w = [], []
        dof_axis = [None] * m.nv
        dof_anchor = [None] * m.nv

        dofs_of_body = [[] for _ in range(m.nb)]
        for j, b in enumerate(m.jnt_body):
            dofs_of_body[b].append(j)

        for b in range(m.nb):
            parent = m.body_parent[b]
            if parent < 0:
                p = jnp.zeros(3, dt)
                r = jnp.array([1.0, 0.0, 0.0, 0.0], dt)
            else:
                p = body_pos_w[parent]
                r = body_quat_w[parent]
            # fixed offset from parent
            p = p + quat_rotate(r, jnp.asarray(m.body_pos[b], dt))
            r = quat_mul(r, jnp.asarray(m.body_quat[b], dt))
            # joints of this body, applied in order
            for j in dofs_of_body[b]:
                axis_local = jnp.asarray(m.jnt_axis[j], dt)
                anchor_local = jnp.asarray(m.jnt_pos[j], dt)
                axis_w = quat_rotate(r, axis_local)
                anchor_w = p + quat_rotate(r, anchor_local)
                dof_axis[j] = axis_w
                dof_anchor[j] = anchor_w
                if m.jnt_type[j] == SLIDE:
                    # MuJoCo displaces by (qpos - ref) (mjcf 'ref' attr)
                    p = p + axis_w * (q[j] - ref[j])
                else:  # HINGE: rotate the body frame about axis through anchor
                    dq = quat_from_axis_angle(axis_local, q[j] - ref[j])
                    r_new = quat_mul(r, dq)
                    # rotate the frame origin about the world-space anchor:
                    # rel expressed in the pre-rotation body frame, then
                    # re-expressed through the post-rotation frame
                    rel = p - anchor_w
                    rel_local = quat_rotate(
                        jnp.concatenate([r[:1], -r[1:]]), rel)
                    p = anchor_w + quat_rotate(r_new, rel_local)
                    r = r_new
            body_pos_w.append(p)
            body_quat_w.append(r)

        body_pos_w = jnp.stack(body_pos_w)
        body_quat_w = jnp.stack(body_quat_w)
        com = body_pos_w + jax.vmap(quat_rotate)(
            body_quat_w, jnp.asarray(m.body_ipos, dt))
        return dict(body_pos=body_pos_w, body_quat=body_quat_w, com=com,
                    dof_axis=jnp.stack(dof_axis),
                    dof_anchor=jnp.stack(dof_anchor))

    # ------------------------------------------------------------ jacobians
    def _point_jacobian(self, kin, points, point_body, ancestor):
        """Translational Jacobian of world points attached to bodies.

        points (np_,3); point_body: (np_,) static ints; ancestor: (np_, nv)
        mask. Returns (np_, 3, nv).
        """
        m = self.model
        axis = kin["dof_axis"]          # (nv, 3)
        anchor = kin["dof_anchor"]      # (nv, 3)
        is_hinge = jnp.asarray(
            np.array([1.0 if t == HINGE else 0.0 for t in m.jnt_type]),
            self.dtype)
        # hinge columns: w x (p - a); slide columns: w
        rel = points[:, None, :] - anchor[None, :, :]       # (np_, nv, 3)
        hinge_cols = jnp.cross(axis[None, :, :], rel)        # (np_, nv, 3)
        slide_cols = jnp.broadcast_to(axis[None, :, :], hinge_cols.shape)
        cols = (is_hinge[None, :, None] * hinge_cols
                + (1 - is_hinge)[None, :, None] * slide_cols)
        cols = cols * ancestor[:, :, None]
        return jnp.swapaxes(cols, 1, 2)                      # (np_, 3, nv)

    def _body_jacobians(self, kin, ancestor):
        """(Jp, Jr) of body COMs: (nb, 3, nv) each."""
        m = self.model
        Jp = self._point_jacobian(kin, kin["com"],
                                  np.arange(m.nb), ancestor)
        axis = kin["dof_axis"]
        is_hinge = jnp.asarray(
            np.array([1.0 if t == HINGE else 0.0 for t in m.jnt_type]),
            self.dtype)
        Jr_cols = axis[None, :, :] * is_hinge[None, :, None]
        Jr_cols = Jr_cols * ancestor[:, :, None]
        Jr = jnp.swapaxes(Jr_cols, 1, 2)
        return Jp, Jr

    # ----------------------------------------------------- physics overrides
    def _phys(self, mods, name, default):
        """Resolve a physics array, applying per-task multiplier overrides.

        ``mods`` maps names ('body_mass', 'body_inertia', 'dof_damping',
        'friction', 'body_pos_delta') to MULTIPLIERS (or deltas) — the task
        representation of the rand-param envs (reference envs/base.py:51-136
        randomizes exactly these via multiplicative factors).
        """
        arr = jnp.asarray(default, self.dtype)
        if mods and name in mods:
            arr = arr * jnp.asarray(mods[name], self.dtype)
        return arr

    # ---------------------------------------------------------- mass matrix
    def _mass_from_kin(self, kin, mods=None):
        # f32 matmul precision throughout: M's PSD structure must survive
        # to the 1e-5-regularized solve (see substep docstring)
        m = self.model
        dt = self.dtype
        hi = jax.lax.Precision.HIGHEST
        ancestor = jnp.asarray(m.ancestor_mask(), dt)
        Jp, Jr = self._body_jacobians(kin, ancestor)
        mass = self._phys(mods, "body_mass", m.body_mass)
        R_b = jax.vmap(quat_to_mat)(kin["body_quat"])
        R_i = jax.vmap(quat_to_mat)(jnp.asarray(m.body_iquat, dt))
        R = jnp.matmul(R_b, R_i, precision=hi)   # inertial frame in world
        inertia = self._phys(mods, "body_inertia", m.body_inertia)
        I_world = jnp.matmul(R, inertia[:, :, None] * jnp.swapaxes(R, 1, 2),
                             precision=hi)
        M = (jnp.einsum("biv,b,biw->vw", Jp, mass, Jp, precision=hi)
             + jnp.einsum("biv,bij,bjw->vw", Jr, I_world, Jr, precision=hi))
        return M + jnp.diag(jnp.asarray(m.dof_armature, dt))

    def mass_matrix(self, q, mods=None):
        return self._mass_from_kin(self.fk(q), mods)

    # ------------------------------------------------------------ potentials
    def gravity_torque(self, q, mods=None):
        m = self.model
        mass = self._phys(mods, "body_mass", m.body_mass)

        def potential(q):
            kin = self.fk(q)
            return -jnp.sum(mass * self.model.gravity * kin["com"][:, 2])

        return -jax.grad(potential)(q)

    # -------------------------------------------------------------- contact
    def _contact_terms(self, q, qd, mods=None, kin=None):
        """Contact forces AND the implicit-solve coefficients.

        Returns (tau, force, J, cn_eff, ct_eff, kn_eff) where J is the
        (nc, 3, nv) contact-point Jacobian and the *_eff vectors are the
        per-contact damping/stiffness coefficients active at this state —
        folded into the integrator's (M + hC + h²K) matrix so the stiff
        velocity-dependent part of the penalty contact integrates
        implicitly (the same trick MuJoCo's Euler uses for joint damping,
        extended to the contact spring-dampers). This is what lets the
        envs run at MuJoCo-like substep counts instead of 2–8× more.
        """
        m = self.model
        dt = self.dtype
        if kin is None:
            kin = self.fk(q)
        ancestor_b = m.ancestor_mask()
        con_anc = jnp.asarray(
            np.stack([ancestor_b[b] for b in m.con_body]), dt)
        pts_local = jnp.asarray(m.con_pos, dt)
        body_idx = np.asarray(m.con_body)
        p_body = kin["body_pos"][body_idx]
        q_body = kin["body_quat"][body_idx]
        points = p_body + jax.vmap(quat_rotate)(q_body, pts_local)
        J = self._point_jacobian(kin, points, body_idx, con_anc)  # (nc,3,nv)
        vel = J @ qd                                              # (nc, 3)
        radius = jnp.asarray(m.con_radius, dt)
        phi = points[:, 2] - radius                               # penetration
        in_contact = (phi < 0.0).astype(dt)
        if len(m.con_skip_ground):
            in_contact = in_contact * (
                1.0 - jnp.asarray(m.con_skip_ground, dt))
        fn = (self.contact_stiffness * (-phi)
              - self.contact_damping * vel[:, 2])
        fn = jnp.maximum(fn, 0.0) * in_contact
        vt = vel[:, :2]
        vt_norm = jnp.sqrt(jnp.sum(vt**2, axis=-1) + 1e-8)
        friction = self._phys(mods, "friction", m.friction)
        # cone-aware tangential coefficient: the slope of the clamped
        # friction force at the current state (= c_t while inside the
        # cone, mu*fn/|vt| once saturated); used both for the explicit
        # force and as the implicit damping linearization
        ct_eff = jnp.minimum(self.contact_tangential_damping,
                             friction * fn / vt_norm) * in_contact
        ft = -ct_eff[:, None] * vt
        force = jnp.concatenate([ft, fn[:, None]], axis=-1)       # (nc, 3)
        tau = jnp.einsum("civ,ci->v", J, force)
        active_n = in_contact * (fn > 0.0)
        cn_eff = self.contact_damping * active_n
        kn_eff = self.contact_stiffness * active_n
        return tau, force, J, cn_eff, ct_eff, kn_eff

    def contact_torque(self, q, qd, mods=None, kin=None):
        m = self.model
        if len(m.con_body) == 0:
            return jnp.zeros_like(q), jnp.zeros((0, 3), self.dtype)
        tau, force = self._contact_terms(q, qd, mods, kin)[:2]
        return tau, force

    def _pair_terms(self, q, qd, mods=None, kin=None):
        """Sphere-sphere contact pairs (manipulation scenes).

        Same penalty spring-damper + cone-clamped friction as the ground
        contact, along the center line between the two spheres; returns
        (tau, J_rel, C_mats) where J_rel = J_a − J_b is the (npair, 3, nv)
        relative-point Jacobian and C_mats the per-pair 3×3 implicit
        coefficient matrices (h·C + h²·K split performed by the caller in
        normal/tangent decomposition here: C = ct (I − nnᵀ) + cn nnᵀ,
        K = kn nnᵀ)."""
        m = self.model
        dt = self.dtype
        if kin is None:
            kin = self.fk(q)
        ancestor_b = m.ancestor_mask()
        body_idx = np.asarray(m.con_body)
        pts_local = jnp.asarray(m.con_pos, dt)
        points = (kin["body_pos"][body_idx]
                  + jax.vmap(quat_rotate)(kin["body_quat"][body_idx],
                                          pts_local))
        radius = jnp.asarray(m.con_radius, dt)
        ia = np.asarray(m.pair_a)
        ib = np.asarray(m.pair_b)
        anc_a = jnp.asarray(
            np.stack([ancestor_b[b] for b in body_idx[ia]]), dt)
        anc_b = jnp.asarray(
            np.stack([ancestor_b[b] for b in body_idx[ib]]), dt)
        Ja = self._point_jacobian(kin, points[ia], body_idx[ia], anc_a)
        Jb = self._point_jacobian(kin, points[ib], body_idx[ib], anc_b)
        J = Ja - Jb                                            # (np_, 3, nv)
        d = points[ia] - points[ib]                            # (np_, 3)
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
        n = d / dist[:, None]
        phi = dist - (radius[ia] + radius[ib])
        in_contact = (phi < 0.0).astype(dt)
        vel = J @ qd                                           # (np_, 3)
        vn = jnp.sum(vel * n, axis=-1)
        fn = (self.contact_stiffness * (-phi)
              - self.contact_damping * vn)
        fn = jnp.maximum(fn, 0.0) * in_contact
        vt = vel - vn[:, None] * n
        vt_norm = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + 1e-8)
        friction = self._phys(mods, "friction", m.friction)
        ct_eff = jnp.minimum(self.contact_tangential_damping,
                             friction * fn / vt_norm) * in_contact
        force = fn[:, None] * n - ct_eff[:, None] * vt         # on sphere a
        tau = jnp.einsum("civ,ci->v", J, force)
        active = in_contact * (fn > 0.0)
        nn = n[:, :, None] * n[:, None, :]                     # (np_, 3, 3)
        eye = jnp.eye(3, dtype=dt)
        C = (ct_eff[:, None, None] * (eye - nn)
             + (self.contact_damping * active)[:, None, None] * nn)
        K = (self.contact_stiffness * active)[:, None, None] * nn
        return tau, J, C, K

    def body_velocities(self, q, qd):
        """Per-body COM spatial velocities (v, w): (nb,3) each — the analog
        of MuJoCo's cvel (used by humanoid observations)."""
        kin = self.fk(q)
        ancestor = jnp.asarray(self.model.ancestor_mask(), self.dtype)
        Jp, Jr = self._body_jacobians(kin, ancestor)
        return Jp @ qd, Jr @ qd

    def contact_wrench(self, q, qd, mods=None):
        """Aggregate contact forces per body -> (nb, 6) [torque, force]
        rows about each body COM — the analog of MuJoCo's cfrc_ext (used by
        ant/humanoid observations, ant_rand_goal.py:52-58)."""
        m = self.model
        nb = m.nb
        if len(m.con_body) == 0:
            return jnp.zeros((nb, 6), self.dtype)
        kin = self.fk(q)
        ancestor_b = m.ancestor_mask()
        con_anc = jnp.asarray(
            np.stack([ancestor_b[b] for b in m.con_body]), self.dtype)
        body_idx = np.asarray(m.con_body)
        p_body = kin["body_pos"][body_idx]
        q_body = kin["body_quat"][body_idx]
        points = p_body + jax.vmap(quat_rotate)(
            q_body, jnp.asarray(m.con_pos, self.dtype))
        _, force = self.contact_torque(q, qd, mods)
        com = kin["com"][body_idx]
        torque = jnp.cross(points - com, force)
        wrench = jnp.zeros((nb, 6), self.dtype)
        wrench = wrench.at[body_idx, :3].add(torque)
        wrench = wrench.at[body_idx, 3:].add(force)
        return wrench

    # ----------------------------------------------------------- fluid drag
    def fluid_torque(self, q, qd, mods=None, kin=None):
        """MuJoCo's inertia-box fluid model, exactly.

        Per body: an equivalent box is derived from the diagonal inertia
        (full side ``box_i = sqrt(6 (I_j + I_k - I_i) / mass)``), velocities
        are expressed in the body-inertial frame at the COM, and the medium
        applies (a) viscous drag ``F = -3 pi d mu v``, ``T = -pi d^3 mu w``
        with ``d = mean(box)`` and (b) quadratic density drag per local axis
        ``F_i = -rho/2 box_j box_k |v_i| v_i``,
        ``T_i = -rho box_i (box_j^4 + box_k^4)/64 |w_i| w_i``.
        Validated bitwise-style against mj_forward's qfrc_passive on the
        swimmer MJCF (tests/test_engine.py). This is the medium of the
        SwimmerRandVel env (reference swimmer_rand_vel.py; density/viscosity
        from the MJCF <option>). Massless bodies are skipped as in MuJoCo.
        """
        m = self.model
        if m.density == 0.0 and m.viscosity == 0.0:
            return jnp.zeros_like(q)
        dt = self.dtype
        if kin is None:
            kin = self.fk(q)
        ancestor = jnp.asarray(m.ancestor_mask(), dt)
        Jp, Jr = self._body_jacobians(kin, ancestor)
        v = Jp @ qd                                    # (nb, 3) com velocity
        w = Jr @ qd                                    # (nb, 3) angular vel
        R_b = jax.vmap(quat_to_mat)(kin["body_quat"])
        R_i = jax.vmap(quat_to_mat)(jnp.asarray(m.body_iquat, dt))
        R = R_b @ R_i                                  # inertial frame in world
        # velocities in the local (inertial) frame: R^T v
        lv = jnp.einsum("bji,bj->bi", R, v)
        lw = jnp.einsum("bji,bj->bi", R, w)
        mass = self._phys(mods, "body_mass", m.body_mass)
        inertia = self._phys(mods, "body_inertia", m.body_inertia)  # (nb,3)
        valid = (mass > 1e-12).astype(dt)[:, None]
        safe_mass = jnp.maximum(mass, 1e-12)[:, None]
        diff = jnp.sum(inertia, -1, keepdims=True) - 2.0 * inertia
        box = jnp.sqrt(jnp.maximum(diff, 1e-15) / safe_mass * 6.0)  # (nb,3)
        lfrc_lin = jnp.zeros_like(lv)
        lfrc_ang = jnp.zeros_like(lw)
        if m.viscosity > 0.0:
            diam = jnp.mean(box, axis=-1, keepdims=True)
            lfrc_ang = lfrc_ang - np.pi * diam**3 * m.viscosity * lw
            lfrc_lin = lfrc_lin - 3.0 * np.pi * diam * m.viscosity * lv
        if m.density > 0.0:
            box1 = jnp.roll(box, -1, axis=-1)          # box[(i+1)%3]
            box2 = jnp.roll(box, -2, axis=-1)          # box[(i+2)%3]
            lfrc_lin = lfrc_lin - (0.5 * m.density * box1 * box2
                                   * jnp.abs(lv) * lv)
            lfrc_ang = lfrc_ang - (m.density * box * (box1**4 + box2**4)
                                   / 64.0 * jnp.abs(lw) * lw)
        force = jnp.einsum("bij,bj->bi", R, lfrc_lin) * valid
        torque = jnp.einsum("bij,bj->bi", R, lfrc_ang) * valid
        return (jnp.einsum("biv,bi->v", Jp, force)
                + jnp.einsum("biv,bi->v", Jr, torque))

    # -------------------------------------------------------------- dynamics
    def _bias_torque(self, q, qd, mods=None):
        """Coriolis/centrifugal: -(Mdot qd) + 1/2 d/dq (qd^T M qd).

        Autodiff formulation, kept as an independent oracle for the RNEA
        fast path (tests assert rnea_bias == -(_bias_torque +
        gravity_torque)); the hot path uses rnea_bias."""
        _, Mdot = jax.jvp(lambda qq: self.mass_matrix(qq, mods), (q,), (qd,))
        quad = jax.grad(
            lambda qq: 0.5 * qd @ self.mass_matrix(qq, mods) @ qd)(q)
        return -(Mdot @ qd) + quad

    def rnea_bias(self, q, qd, mods=None, kin=None):
        """Bias forces C(q,qd)qd + g(q) — MuJoCo's qfrc_bias — via a
        recursive-Newton-Euler velocity pass (qdd = 0, gravity folded in as
        base acceleration), replacing the substep's former double autodiff
        of the mass matrix (one reverse + one forward pass over full FK per
        substep). All quantities live in world-aligned Plücker coordinates
        re-centered at the root body to keep float32 lever arms small.

        tau enters the equation of motion as M qdd = tau_applied - bias,
        matching mj_forward's qfrc_bias sign.
        """
        m = self.model
        dt = self.dtype
        if kin is None:
            kin = self.fk(q)
        origin = kin["body_pos"][0]
        anchor = kin["dof_anchor"] - origin            # (nv, 3)
        com = kin["com"] - origin                      # (nb, 3)
        axis = kin["dof_axis"]                         # (nv, 3)
        is_hinge = jnp.asarray(
            np.array([1.0 if t == HINGE else 0.0 for t in m.jnt_type]), dt)

        # motion subspace S_j = (w, v_O): hinge (a, p x a), slide (0, a)
        Sw = axis * is_hinge[:, None]
        Sv = jnp.where(is_hinge[:, None] > 0.0,
                       jnp.cross(anchor, axis), axis)
        S = jnp.concatenate([Sw, Sv], axis=-1)         # (nv, 6)
        Sqd = S * qd[:, None]

        def cross_motion(V, U):
            w1, v1 = V[..., :3], V[..., 3:]
            w2, v2 = U[..., :3], U[..., 3:]
            return jnp.concatenate(
                [jnp.cross(w1, w2), jnp.cross(w1, v2) + jnp.cross(v1, w2)],
                axis=-1)

        def cross_force(V, F):
            w, v = V[..., :3], V[..., 3:]
            n, f = F[..., :3], F[..., 3:]
            return jnp.concatenate(
                [jnp.cross(w, n) + jnp.cross(v, f), jnp.cross(w, f)],
                axis=-1)

        # Sdot_j = V_parent(j) x_m S_j  (S is fixed in its parent frame)
        dof_anc = jnp.asarray(m.dof_ancestor_strict(), dt)
        Vminus = dof_anc @ Sqd                         # (nv, 6)
        Sdot_qd = cross_motion(Vminus, S) * qd[:, None]

        body_anc = jnp.asarray(m.ancestor_mask(), dt)
        Vb = body_anc @ Sqd                            # (nb, 6)
        Ab = body_anc @ Sdot_qd                        # (nb, 6) bias accel
        # gravity trick: base acceleration = -a_g = (0, (0,0,-gravity))
        Ab = Ab - jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, m.gravity], dt)

        mass = self._phys(mods, "body_mass", m.body_mass)
        inertia = self._phys(mods, "body_inertia", m.body_inertia)
        R_b = jax.vmap(quat_to_mat)(kin["body_quat"])
        R_i = jax.vmap(quat_to_mat)(jnp.asarray(m.body_iquat, dt))
        R = R_b @ R_i
        I_c = R @ (inertia[:, :, None] * jnp.swapaxes(R, 1, 2))  # (nb,3,3)

        def inertia_apply(V):
            w, v = V[..., :3], V[..., 3:]
            v_c = v + jnp.cross(w, com)
            f = mass[:, None] * v_c
            n = jnp.einsum("bij,bj->bi", I_c, w) + jnp.cross(com, f)
            return jnp.concatenate([n, f], axis=-1)

        Fb = inertia_apply(Ab) + cross_force(Vb, inertia_apply(Vb))
        # tau_j = S_j . sum_{b in subtree(j)} F_b ; pairing (w,v).(n,f)
        tau = jnp.einsum("jc,bc,bj->j", S, Fb, body_anc)
        # armature: rotor inertia is diagonal in dof space, so its only
        # bias contribution is gravity-free and velocity-diagonal => none
        # for qdd = 0 (matches MuJoCo: armature enters M only)
        return tau

    def _limit_terms(self, q, qd):
        """Joint-limit penalty torque + the per-dof implicit (c, k) pair
        active at this state (diagonal in dof space)."""
        m = self.model
        dt = self.dtype
        lo = jnp.asarray(m.jnt_range[:, 0], dt)
        hi = jnp.asarray(m.jnt_range[:, 1], dt)
        limited = jnp.asarray((np.abs(m.jnt_range).sum(1) > 0), dt)
        below = jnp.minimum(q - lo, 0.0)
        above = jnp.maximum(q - hi, 0.0)
        viol = below + above
        active = (jnp.abs(viol) > 0).astype(dt) * limited
        tau = (-self.limit_stiffness * viol * limited
               - self.limit_damping * qd * active)
        return tau, self.limit_damping * active, self.limit_stiffness * active

    def _limit_torque(self, q, qd):
        return self._limit_terms(q, qd)[0]

    def substep(self, q, qd, tau_act, h, mods=None):
        """One semi-implicit Euler substep.

        Structured for a SMALL compiled program (the scan body dominates
        whole-rollout compile time): forward kinematics is evaluated once
        and shared by the mass matrix / contacts / fluid / RNEA; the
        Coriolis + gravity bias comes from the O(nb) rnea_bias velocity
        pass (no autodiff in the hot path).

        The (M + hC + h²K) ASSEMBLY einsums run at float32 matmul
        precision (the force-path einsums stay at the TPU default):
        bf16 MXU inputs put ~1e-2 relative error into the mass-matrix /
        implicit-contact einsums, which swamps the 1e-5 Tikhonov
        regularization exactly where it matters — the near-singular
        gimbal-lock corner — and the clamped-pivot solve then amplifies
        the indefinite system into overflow/NaN. Root-caused in round 5
        by replaying a captured diverging AntRandDirec instance: NaN
        under bf16, finite (and CPU-identical) under f32 precision
        (tests/test_engine.py::test_gimbal_lock_capture_stays_finite).
        Force-term noise is bounded and cannot destabilize the solve,
        so it keeps the cheap path (a blanket f32 wrap measured +49%
        on the humanoid substep; the targeted one is ~free).
        """
        m = self.model
        dt = self.dtype
        damping = self._phys(mods, "dof_damping", m.dof_damping)
        stiffness = jnp.asarray(m.jnt_stiffness, dt)
        springref = jnp.asarray(m.jnt_springref, dt)

        kin = self.fk(q)
        M = self._mass_from_kin(kin, mods)

        tau_lim, c_lim, k_lim = self._limit_terms(q, qd)
        tau = (tau_act
               - self.rnea_bias(q, qd, mods, kin=kin)
               + self.fluid_torque(q, qd, mods, kin=kin)
               + tau_lim
               - stiffness * (q - springref)
               - damping * qd)
        # diagonal implicit terms: joint damping (MuJoCo Euler), joint
        # springs, active limit spring-dampers
        diag_cd = (h * (damping + c_lim)
                   + h * h * (k_lim + stiffness))
        # consistent implicit Euler for the position-dependent (stiffness)
        # forces: f(q⁺) ≈ f(q) − hK v⁺ contributes h²K qdd to A *and*
        # −hK v to the right-hand side. Omitting the RHS term (pre-round-3
        # behavior) acts as extra artificial damping of the approach
        # velocity and shifts the spring response vs MuJoCo.
        tau = tau - h * (k_lim + stiffness) * qd
        if len(m.con_body):
            tau_c, _, J, cn, ct, kn = self._contact_terms(q, qd, mods, kin)
            tau = tau + tau_c
            # implicit contact spring-dampers: h Jᵀ C J + h² Jnᵀ K Jn.
            # C couples (ct, ct, cn) per contact axis; K acts on the
            # normal row only. Stabilizes the k=1e4-class penalties at
            # MuJoCo-native substep counts.
            coef = jnp.stack([h * ct, h * ct, h * cn + h * h * kn],
                             axis=-1)                        # (nc, 3)
            A_con = jnp.einsum("civ,ci,ciw->vw", J, coef, J,
                               precision=jax.lax.Precision.HIGHEST)
            # RHS mate of the h² Jnᵀ K Jn term (see diag comment above)
            vz = jnp.einsum("cv,v->c", J[:, 2], qd)
            tau = tau - h * jnp.einsum("cv,c->v", J[:, 2], kn * vz)
        else:
            A_con = 0.0
        if len(m.pair_a):
            tau_p, Jp_, Cp, Kp = self._pair_terms(q, qd, mods, kin)
            tau = tau + tau_p
            A_con = A_con + jnp.einsum(
                "civ,cij,cjw->vw", Jp_, h * Cp + h * h * Kp, Jp_,
                precision=jax.lax.Precision.HIGHEST)
            tau = tau - h * jnp.einsum(
                "civ,cij,cjw,w->v", Jp_, Kp, Jp_, qd)
        # A is SPD up to the gimbal-lock singularity of Euler free roots —
        # the scale-aware Tikhonov term keeps the Cholesky finite there
        reg = self.solve_reg * (jnp.trace(M) / m.nv)
        A = (M + jnp.diag(diag_cd) + A_con
             + reg * jnp.eye(m.nv, dtype=dt))
        if m.nv <= 16:
            # statically unrolled Cholesky solve: XLA's generic batched
            # cholesky/cho_solve was 78% of the substep on TPU (~830 us
            # vs ~58 us unrolled for nv=9 x 800 envs — ops/smallsolve.py)
            qdd = chol_solve_unrolled(A, tau)
        else:
            # humanoid-class (nv=23): the O(nv^2) scalar unroll inflates
            # the traced program enough that the remote XLA compile goes
            # from ~minutes to wedged (observed >28 min, round 4); the
            # COLUMN-unrolled variant keeps program size O(nv) while
            # avoiding the generic blocked solver that was 70% of the
            # humanoid substep (1.9 of 2.7 ms at batch 800, round 5)
            qdd = chol_solve_cols(A, tau)
        qd_new = jnp.clip(qd + h * qdd, -self.max_qvel, self.max_qvel)
        q_new = q + h * qd_new
        return q_new, qd_new

    def _cached(self, slot, build):
        """cached_property-style stash that works on the frozen dataclass
        (direct __dict__ write bypasses the frozen __setattr__; a unique
        object() sentinel distinguishes 'never computed' from None)."""
        cached = self.__dict__.get(slot, _UNSET)
        if cached is _UNSET:
            cached = build()
            self.__dict__[slot] = cached
        return cached

    @property
    def _planar_substep(self):
        """Cached planar fast-path substep, or None if ineligible."""
        def build():
            if self.use_planar:
                from promp_tpu.envs.mujoco import planar
                if planar.planar_ok(self.model):
                    return planar.make_planar_substep(self)
            return None
        return self._cached("_planar_substep_cache", build)

    @property
    def _spatial_substep(self):
        """Cached 3-D scalar fast-path substep, or None if ineligible."""
        def build():
            if self.use_spatial and self.model.nv <= self.spatial_max_nv:
                if jax.default_backend() == "cpu" and not self.spatial_on_cpu:
                    return None   # XLA:CPU miscompile — see field comment
                from promp_tpu.envs.mujoco import spatial
                if spatial.spatial_ok(self.model):
                    return spatial.make_spatial_substep(self)
            return None
        return self._cached("_spatial_substep_cache", build)

    def _pallas_chain(self, n_steps, mod_keys=()):
        """Cached vmappable Pallas substep-chain for (n_steps, mod_keys),
        or None. With mod_keys, the chain takes the rand-params mods
        dict as a fourth argument (multipliers become kernel inputs)."""
        def build():
            if not self.use_pallas_substep:
                return None
            if jax.default_backend() in ("cpu",):
                return None        # Mosaic kernels are TPU-only here
            from promp_tpu.ops import pallas_substep
            if not pallas_substep.pallas_chain_ok(self):
                return None
            if mod_keys:
                if not pallas_substep.mod_keys_ok(mod_keys):
                    return None
                return pallas_substep.make_vmappable_chain_mods(
                    self, n_steps, mod_keys,
                    tile=self.pallas_substep_tile)
            return pallas_substep.make_vmappable_chain(
                self, n_steps, tile=self.pallas_substep_tile)

        cache = self._cached("_pallas_chain_cache", dict)
        if (n_steps, mod_keys) not in cache:
            cache[(n_steps, mod_keys)] = build()
        return cache[(n_steps, mod_keys)]

    def step(self, q, qd, ctrl, frame_skip, mods=None):
        """Advance frame_skip MJCF frames (the env-visible dt)."""
        m = self.model
        dt = self.dtype
        gear = jnp.asarray(m.act_gear, dt)
        lo = jnp.asarray(m.act_ctrlrange[:, 0], dt)
        hi = jnp.asarray(m.act_ctrlrange[:, 1], dt)
        ctrl = jnp.clip(ctrl, lo, hi)
        tau_act = jnp.zeros(m.nv, dt).at[jnp.asarray(m.act_dof)].add(
            gear * ctrl)
        h = jnp.asarray(m.timestep / self.n_substeps, dt)
        # The megakernel beats BOTH fallback formulations on TPU —
        # planar bodies included (cheetah physics-only: 13.3M vs the
        # planar XLA path's 5.4M env-steps/s at batch 800; parity
        # planar-vs-kernel |dqd| <= 1.4e-5/env-step). Rand-params mods
        # ride along as packed per-lane multiplier inputs. Planar
        # remains the fast path on CPU and for unsupported mod keys.
        if mods is None:
            chain = self._pallas_chain(frame_skip * self.n_substeps)
            if chain is not None:
                return chain(q, qd, tau_act)
        else:
            chain = self._pallas_chain(frame_skip * self.n_substeps,
                                       tuple(sorted(mods)))
            if chain is not None:
                return chain(q, qd, tau_act, mods)
        substep = (self._planar_substep or self._spatial_substep
                   or self.substep)

        def body(carry, _):
            q, qd = carry
            q, qd = substep(q, qd, tau_act, h, mods)
            return (q, qd), None

        (q, qd), _ = jax.lax.scan(body, (q, qd), None,
                                  length=frame_skip * self.n_substeps)
        return q, qd

    @property
    def dt(self):
        return self.model.timestep
