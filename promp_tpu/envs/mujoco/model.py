"""Articulated rigid-body model spec + MJCF importer.

The locomotion meta-envs (reference: meta_policy_search/envs/mujoco_envs/*)
run on MuJoCo through CPython bindings, which cannot live inside jit
(SURVEY.md §2.9 P6). Here the physics runs in a JAX-native generalized-
coordinate engine (promp_tpu/envs/mujoco/engine.py); this module defines
the static model description it consumes:

  * a kinematic tree of bodies, each connected to its parent by zero or
    more 1-DoF joints (slide / hinge about an axis through an anchor)
  * free joints are decomposed into 3 world-aligned slides + 3 intrinsic
    x-y-z Euler hinges (orientation re-assembled as a quaternion for
    MuJoCo-compatible observations)
  * capsule/sphere geoms reduced to contact spheres for ground collision

Specs are extracted ONCE from the canonical gymnasium MJCF assets using the
CPython mujoco package (host-side, build time only) and cached as .npz next
to this file, so TPU runtime never needs mujoco installed.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Tuple

import numpy as np

_SPEC_DIR = os.path.join(os.path.dirname(__file__), "specs")

SLIDE, HINGE = 0, 1


@dataclass(frozen=True)
class ChainModel:
    """Static model arrays (all numpy; hashable by identity for jit).

    Shapes: nb = number of bodies (world excluded), nv = number of DoFs,
    nu = actuators, nc = contact spheres.
    """

    # tree structure
    body_parent: Tuple[int, ...]          # (nb,) parent body index, -1=world
    body_pos: np.ndarray                  # (nb, 3) frame offset in parent
    body_quat: np.ndarray                 # (nb, 4)
    body_mass: np.ndarray                 # (nb,)
    body_inertia: np.ndarray              # (nb, 3) diagonal, inertial frame
    body_ipos: np.ndarray                 # (nb, 3) com offset in body frame
    body_iquat: np.ndarray                # (nb, 4) inertial frame rotation

    # joints: each dof belongs to a body; dofs of a body apply in order
    jnt_body: Tuple[int, ...]             # (nv,) body index
    jnt_type: Tuple[int, ...]             # (nv,) SLIDE | HINGE
    jnt_axis: np.ndarray                  # (nv, 3) axis in body frame
    jnt_pos: np.ndarray                   # (nv, 3) anchor in body frame
    jnt_range: np.ndarray                 # (nv, 2) limits; [0,0] = unlimited
    jnt_ref: np.ndarray                   # (nv,) joint reference value —
                                          # MuJoCo kinematics displace by
                                          # (qpos - ref), mjcf 'ref' attr
    jnt_stiffness: np.ndarray             # (nv,)
    jnt_springref: np.ndarray             # (nv,)
    dof_damping: np.ndarray               # (nv,)
    dof_armature: np.ndarray              # (nv,)

    # actuators
    act_dof: Tuple[int, ...]              # (nu,) target dof index
    act_gear: np.ndarray                  # (nu,)
    act_ctrlrange: np.ndarray             # (nu, 2)

    # contact spheres (collide with the ground plane z=0, and pairwise
    # where listed in pair_a/pair_b)
    con_body: Tuple[int, ...]             # (nc,) body index
    con_pos: np.ndarray                   # (nc, 3) center in body frame
    con_radius: np.ndarray                # (nc,)
    friction: float                       # tangential friction coefficient

    # integration
    timestep: float                       # MJCF opt.timestep
    gravity: float                        # -9.81 etc (z component)
    init_qpos: np.ndarray                 # (nv,) engine coordinates
    init_qvel: np.ndarray                 # (nv,)

    # free-joint bookkeeping: index of the first of 6 decomposed dofs, or -1
    free_dof_start: int = -1
    # fluid model (swimmer): MuJoCo medium density/viscosity
    density: float = 0.0
    viscosity: float = 0.0
    # per-body capsule (axis in body frame, half-length, radius) for drag
    geom_axis: np.ndarray = field(default=None)     # (nb, 3)
    geom_halflen: np.ndarray = field(default=None)  # (nb,)
    geom_radius: np.ndarray = field(default=None)   # (nb,)
    # sphere-sphere contact pairs: indices into the con_* sphere table
    # (manipulation scenes: end-effector vs object/handle)
    pair_a: Tuple[int, ...] = ()          # (npair,)
    pair_b: Tuple[int, ...] = ()          # (npair,)
    # spheres that do NOT collide with the ground plane (1 = skip), e.g.
    # an end-effector that lives above a table plane
    con_skip_ground: Tuple[int, ...] = ()  # (nc,) 0/1; () = all collide

    @property
    def nv(self):
        return len(self.jnt_type)

    @property
    def nb(self):
        return len(self.body_parent)

    @property
    def nu(self):
        return len(self.act_dof)

    def ancestor_mask(self):
        """(nb, nv) 1.0 where dof j moves body b."""
        mask = np.zeros((self.nb, self.nv), np.float32)
        for b in range(self.nb):
            chain = []
            cur = b
            while cur >= 0:
                chain.append(cur)
                cur = self.body_parent[cur]
            for j in range(self.nv):
                if self.jnt_body[j] in chain:
                    mask[b, j] = 1.0
        return mask

    def dof_ancestor_strict(self):
        """(nv, nv) 1.0 where dof k is a STRICT ancestor of dof j — i.e. k
        is applied before j on j's kinematic chain (dofs of ancestor bodies,
        plus earlier dofs of j's own body, which apply in declaration
        order). Used by the RNEA bias pass: the motion subspace of joint j
        is carried by the frame built from exactly these dofs."""
        body_anc = self.ancestor_mask()
        mask = np.zeros((self.nv, self.nv), np.float32)
        for j in range(self.nv):
            b = self.jnt_body[j]
            parent = self.body_parent[b]
            for k in range(self.nv):
                kb = self.jnt_body[k]
                if kb == b:
                    if k < j:
                        mask[j, k] = 1.0
                elif parent >= 0 and body_anc[parent, k]:
                    mask[j, k] = 1.0
        return mask


def _mj_quat_to_np(q):
    return np.asarray(q, np.float64)


def build_from_mjcf(xml_path, contact_bodies=None):
    """Extract a ChainModel from an MJCF file via the CPython mujoco package.

    ``contact_bodies``: optional list of body names to generate contact
    spheres for (default: every body with a capsule/sphere geom — the
    capsule endpoints and midpoint become contact spheres).
    """
    import mujoco

    m = mujoco.MjModel.from_xml_path(xml_path)

    body_parent, body_pos, body_quat = [], [], []
    body_mass, body_inertia, body_ipos, body_iquat = [], [], [], []
    # engine body index = mujoco body index - 1 (skip world)
    for b in range(1, m.nbody):
        body_parent.append(int(m.body_parentid[b]) - 1)
        body_pos.append(m.body_pos[b].copy())
        body_quat.append(m.body_quat[b].copy())
        body_mass.append(float(m.body_mass[b]))
        body_inertia.append(m.body_inertia[b].copy())
        body_ipos.append(m.body_ipos[b].copy())
        body_iquat.append(m.body_iquat[b].copy())

    jnt_body, jnt_type, jnt_axis, jnt_pos = [], [], [], []
    jnt_range, jnt_stiffness, jnt_springref, jnt_ref = [], [], [], []
    dof_damping, dof_armature = [], []
    qpos_map = []  # engine dof -> mujoco qpos address (or ("free",...) tag)
    free_dof_start = -1

    for j in range(m.njnt):
        body = int(m.jnt_bodyid[j]) - 1
        jtype = int(m.jnt_type[j])
        qadr = int(m.jnt_qposadr[j])
        dadr = int(m.jnt_dofadr[j])
        if jtype == int(mujoco.mjtJoint.mjJNT_FREE):
            free_dof_start = len(jnt_type)
            # for free joints MuJoCo's qpos IS the global pose and body_pos
            # is only its initial value (folded into qpos0) — zero the fixed
            # offset so slides+hinges fully define the frame
            body_pos[body] = np.zeros(3)
            body_quat[body] = np.array([1.0, 0.0, 0.0, 0.0])
            # 3 world-aligned slides + 3 intrinsic xyz hinges
            for k, axis in enumerate(np.eye(3)):
                jnt_body.append(body)
                jnt_type.append(SLIDE)
                jnt_axis.append(axis.copy())
                jnt_pos.append(np.zeros(3))
                jnt_range.append(np.zeros(2))
                jnt_stiffness.append(0.0)
                jnt_springref.append(0.0)
                jnt_ref.append(0.0)
                dof_damping.append(float(m.dof_damping[dadr + k]))
                dof_armature.append(float(m.dof_armature[dadr + k]))
                qpos_map.append(("free_pos", qadr + k))
            for k, axis in enumerate(np.eye(3)):
                jnt_body.append(body)
                jnt_type.append(HINGE)
                jnt_axis.append(axis.copy())
                jnt_pos.append(np.zeros(3))
                jnt_range.append(np.zeros(2))
                jnt_stiffness.append(0.0)
                jnt_springref.append(0.0)
                jnt_ref.append(0.0)
                dof_damping.append(float(m.dof_damping[dadr + 3 + k]))
                dof_armature.append(float(m.dof_armature[dadr + 3 + k]))
                qpos_map.append(("free_euler", qadr + 3, k))
        elif jtype in (int(mujoco.mjtJoint.mjJNT_SLIDE),
                       int(mujoco.mjtJoint.mjJNT_HINGE)):
            jnt_body.append(body)
            jnt_type.append(SLIDE if jtype == int(mujoco.mjtJoint.mjJNT_SLIDE)
                            else HINGE)
            jnt_axis.append(m.jnt_axis[j].copy())
            jnt_pos.append(m.jnt_pos[j].copy())
            limited = bool(m.jnt_limited[j])
            jnt_range.append(m.jnt_range[j].copy() if limited
                             else np.zeros(2))
            jnt_stiffness.append(float(m.jnt_stiffness[j]))
            jnt_springref.append(float(m.qpos_spring[qadr])
                                 if hasattr(m, "qpos_spring") else 0.0)
            jnt_ref.append(float(m.qpos0[qadr]))
            dof_damping.append(float(m.dof_damping[dadr]))
            dof_armature.append(float(m.dof_armature[dadr]))
            qpos_map.append(("scalar", qadr))
        else:
            raise NotImplementedError(f"joint type {jtype}")

    # actuators (joint transmissions only)
    act_dof, act_gear, act_ctrlrange = [], [], []
    dof_of_mj_joint = {}
    eng_dof = 0
    for j in range(m.njnt):
        jtype = int(m.jnt_type[j])
        if jtype == int(mujoco.mjtJoint.mjJNT_FREE):
            eng_dof += 6
        else:
            dof_of_mj_joint[j] = eng_dof
            eng_dof += 1
    for u in range(m.nu):
        mj_joint = int(m.actuator_trnid[u][0])
        act_dof.append(dof_of_mj_joint[mj_joint])
        act_gear.append(float(m.actuator_gear[u][0]))
        act_ctrlrange.append(m.actuator_ctrlrange[u].copy())

    # contact spheres from capsule/sphere geoms
    con_body, con_pos, con_radius = [], [], []
    geom_axis = np.tile(np.array([0.0, 0.0, 1.0]), (m.nbody - 1, 1))
    geom_halflen = np.zeros(m.nbody - 1)
    geom_radius = np.zeros(m.nbody - 1)
    name_of = lambda b: mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_BODY, b)
    for g in range(m.ngeom):
        b = int(m.geom_bodyid[g]) - 1
        if b < 0:
            continue  # world geoms (floor)
        if contact_bodies is not None and name_of(b + 1) not in contact_bodies:
            include = False
        else:
            include = True
        gtype = int(m.geom_type[g])
        size = m.geom_size[g]
        pos = m.geom_pos[g].copy()
        quat = m.geom_quat[g].copy()
        if gtype == int(mujoco.mjtGeom.mjGEOM_CAPSULE):
            r, half = float(size[0]), float(size[1])
            # capsule axis = local z rotated by geom quat
            w, x, y, z = quat
            axis = np.array([2 * (x * z + w * y),
                             2 * (y * z - w * x),
                             1 - 2 * (x * x + y * y)])
            if geom_halflen[b] < half:
                geom_axis[b] = axis
                geom_halflen[b] = half
                geom_radius[b] = r
            if include:
                for s in (-1.0, 0.0, 1.0):
                    con_body.append(b)
                    con_pos.append(pos + s * half * axis)
                    con_radius.append(r)
        elif gtype == int(mujoco.mjtGeom.mjGEOM_SPHERE):
            r = float(size[0])
            geom_radius[b] = max(geom_radius[b], r)
            if include:
                con_body.append(b)
                con_pos.append(pos)
                con_radius.append(r)
        # boxes/planes etc: skip (floor handled analytically)

    friction = float(m.geom_friction[:, 0].max()) if m.ngeom else 1.0

    # initial engine coordinates from qpos0
    init_qpos = np.zeros(len(jnt_type))
    for d, tag in enumerate(qpos_map):
        if tag[0] == "scalar":
            init_qpos[d] = m.qpos0[tag[1]]
        elif tag[0] == "free_pos":
            init_qpos[d] = m.qpos0[tag[1]]
        else:  # free_euler: qpos0 quat -> intrinsic xyz euler (pure numpy —
            # this runs at spec-build time, possibly under a jax trace)
            w, x, y, z = m.qpos0[tag[1]:tag[1] + 4]
            R = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x),
                 1 - 2 * (x * x + y * y)]])
            e = (np.arctan2(-R[1, 2], R[2, 2]),
                 np.arcsin(np.clip(R[0, 2], -1.0, 1.0)),
                 np.arctan2(-R[0, 1], R[0, 0]))
            init_qpos[d] = float(e[tag[2]])

    return ChainModel(
        body_parent=tuple(body_parent),
        body_pos=np.asarray(body_pos, np.float64),
        body_quat=np.asarray(body_quat, np.float64),
        body_mass=np.asarray(body_mass, np.float64),
        body_inertia=np.asarray(body_inertia, np.float64),
        body_ipos=np.asarray(body_ipos, np.float64),
        body_iquat=np.asarray(body_iquat, np.float64),
        jnt_body=tuple(jnt_body),
        jnt_type=tuple(jnt_type),
        jnt_axis=np.asarray(jnt_axis, np.float64),
        jnt_pos=np.asarray(jnt_pos, np.float64),
        jnt_range=np.asarray(jnt_range, np.float64),
        jnt_ref=np.asarray(jnt_ref, np.float64),
        jnt_stiffness=np.asarray(jnt_stiffness, np.float64),
        jnt_springref=np.asarray(jnt_springref, np.float64),
        dof_damping=np.asarray(dof_damping, np.float64),
        dof_armature=np.asarray(dof_armature, np.float64),
        act_dof=tuple(act_dof),
        act_gear=np.asarray(act_gear, np.float64),
        act_ctrlrange=np.asarray(act_ctrlrange, np.float64),
        con_body=tuple(con_body),
        con_pos=np.asarray(con_pos, np.float64).reshape(-1, 3),
        con_radius=np.asarray(con_radius, np.float64),
        friction=friction,
        timestep=float(m.opt.timestep),
        gravity=float(m.opt.gravity[2]),
        init_qpos=init_qpos,
        init_qvel=np.zeros(len(jnt_type)),
        free_dof_start=free_dof_start,
        density=float(m.opt.density),
        viscosity=float(m.opt.viscosity),
        geom_axis=geom_axis,
        geom_halflen=geom_halflen,
        geom_radius=geom_radius,
    )


_ARRAY_FIELDS = [
    "body_pos", "body_quat", "body_mass", "body_inertia", "body_ipos",
    "body_iquat", "jnt_axis", "jnt_pos", "jnt_range", "jnt_ref",
    "jnt_stiffness",
    "jnt_springref", "dof_damping", "dof_armature", "act_gear",
    "act_ctrlrange", "con_pos", "con_radius", "init_qpos", "init_qvel",
    "geom_axis", "geom_halflen", "geom_radius",
]
_TUPLE_FIELDS = ["body_parent", "jnt_body", "jnt_type", "act_dof",
                 "con_body", "pair_a", "pair_b", "con_skip_ground"]
_SCALAR_FIELDS = ["friction", "timestep", "gravity", "free_dof_start",
                  "density", "viscosity"]


def save_spec(model: ChainModel, path):
    data = {f: getattr(model, f) for f in _ARRAY_FIELDS}
    data.update({f: np.asarray(getattr(model, f)) for f in _TUPLE_FIELDS})
    data.update({f: np.asarray(getattr(model, f)) for f in _SCALAR_FIELDS})
    np.savez(path, **data)


def load_spec(path) -> ChainModel:
    z = np.load(path)
    kwargs = {f: z[f] for f in _ARRAY_FIELDS}
    # new tuple fields default to () for specs cached before they existed
    kwargs.update({f: tuple(int(x) for x in z[f]) if f in z else ()
                   for f in _TUPLE_FIELDS})
    kwargs.update({f: z[f].item() for f in _SCALAR_FIELDS})
    kwargs["free_dof_start"] = int(kwargs["free_dof_start"])
    return ChainModel(**kwargs)


def get_model(name) -> ChainModel:
    """Load a cached spec; regenerate from gymnasium MJCF if missing."""
    path = os.path.join(_SPEC_DIR, f"{name}.npz")
    if os.path.exists(path):
        return load_spec(path)
    import gymnasium
    assets = os.path.join(os.path.dirname(gymnasium.__file__),
                          "envs/mujoco/assets")
    model = build_from_mjcf(os.path.join(assets, f"{name}.xml"))
    os.makedirs(_SPEC_DIR, exist_ok=True)
    save_spec(model, path)
    return model
