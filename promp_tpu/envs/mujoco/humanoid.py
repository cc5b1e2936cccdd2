"""Humanoid meta-envs (3D biped, free root decomposed to 6 DoF).

Pure-function ports of the reference's humanoid envs (reference:
meta_policy_search/envs/mujoco_envs/humanoid_rand_direc.py,
humanoid_rand_direc_2d.py). Observation blocks mirror the reference's
layout (:34-41): qpos[2:], qvel, cinert, cvel, qfrc_actuator, cfrc_ext —
with the engine's equivalents for the com-based quantities:
cinert -> per-body [I_world upper-triangular 6, m*com, m] (10 each),
cvel -> per-body [w, v] (6), cfrc_ext -> contact wrench (6).
Rewards use the mass-center displacement like the reference's
``mass_center`` helper (:6-9).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from promp_tpu.envs.base import register_env
from promp_tpu.envs.mujoco.locomotion import LocomotionEnv
from promp_tpu.envs.mujoco.rotations import quat_from_euler_xyz, quat_to_mat


@dataclass(frozen=True)
class HumanoidBase(LocomotionEnv):
    """Reset noise U(-0.01, 0.01) on both (humanoid_rand_direc.py:58-63);
    frame_skip 5; done when torso z outside [1.0, 2.0] (:55)."""

    model_name: str = "humanoid"
    frame_skip: int = 5
    n_substeps: int = 2
    qpos_noise: float = 0.01
    qvel_noise: float = 0.01
    qvel_noise_kind: str = "uniform"
    diagnostics_keys = ("reward_linvel", "reward_quadctrl")

    def _qpos_mj(self, q):
        quat = quat_from_euler_xyz(q[3], q[4], q[5])
        return jnp.concatenate([q[:3], quat, q[6:]])

    def _mass_center_xy(self, state, task):
        kin = self.engine.fk(state["q"])
        mass = jnp.asarray(self.model.body_mass, jnp.float32)
        if self._mods(task):
            mass = mass * jnp.asarray(self._mods(task).get(
                "body_mass", 1.0), jnp.float32)
        com = jnp.sum(mass[:, None] * kin["com"], axis=0) / jnp.sum(mass)
        return com[:2]

    def _obs_dim(self):
        nb1 = self.model.nb + 1  # + world row, MuJoCo cfrc/cinert layout
        return ((self.model.nv - 1) + self.model.nv + 10 * nb1 + 6 * nb1
                + self.model.nv + 6 * nb1)

    def _obs(self, state, task):
        eng = self.engine
        m = self.model
        q, qd = state["q"], state["qd"]
        kin = eng.fk(q)
        mods = self._mods(task)
        mass = jnp.asarray(m.body_mass, jnp.float32)
        # cinert analog: [I_world upper triangle (6), m*com (3), m (1)]
        R_b = jax.vmap(quat_to_mat)(kin["body_quat"])
        R_i = jax.vmap(quat_to_mat)(jnp.asarray(m.body_iquat, jnp.float32))
        R = R_b @ R_i
        I_w = R @ (jnp.asarray(m.body_inertia, jnp.float32)[:, :, None]
                   * jnp.swapaxes(R, 1, 2))
        triu = jnp.stack([I_w[:, 0, 0], I_w[:, 1, 1], I_w[:, 2, 2],
                          I_w[:, 0, 1], I_w[:, 0, 2], I_w[:, 1, 2]], -1)
        cinert = jnp.concatenate(
            [triu, mass[:, None] * kin["com"], mass[:, None]], axis=-1)
        cinert = jnp.concatenate([jnp.zeros((1, 10)), cinert])
        v, w = eng.body_velocities(q, qd)
        cvel = jnp.concatenate([jnp.zeros((1, 6)),
                                jnp.concatenate([w, v], axis=-1)])
        qfrc_actuator = state.get("last_tau", jnp.zeros(m.nv))
        cfrc = jnp.concatenate([jnp.zeros((1, 6)),
                                eng.contact_wrench(q, qd, mods)])
        return jnp.concatenate([
            self._qpos_mj(q)[2:], qd, cinert.reshape(-1), cvel.reshape(-1),
            qfrc_actuator, cfrc.reshape(-1)])

    def reset(self, key, task):
        state, _ = super().reset(key, task)
        state = dict(state, last_tau=jnp.zeros(self.model.nv))
        return state, self._obs(state, task)

    def _step_common(self, state, action, task, lin_vel_cost):
        m = self.model
        gear = jnp.asarray(m.act_gear, jnp.float32)
        lo = jnp.asarray(m.act_ctrlrange[:, 0], jnp.float32)
        hi = jnp.asarray(m.act_ctrlrange[:, 1], jnp.float32)
        ctrl = jnp.clip(action, lo, hi)
        last_tau = jnp.zeros(m.nv).at[jnp.asarray(m.act_dof)].add(
            gear * ctrl)
        state = dict(state, last_tau=last_tau)
        alive_bonus = 5.0
        quad_ctrl_cost = 0.1 * jnp.sum(jnp.square(ctrl))
        cfrc = self.engine.contact_wrench(state["q"], state["qd"],
                                          self._mods(task))
        quad_impact_cost = jnp.minimum(
            0.5e-6 * jnp.sum(jnp.square(cfrc)), 10.0)
        reward = (lin_vel_cost - quad_ctrl_cost - quad_impact_cost
                  + alive_bonus)
        z = state["q"][2]
        finite = jnp.all(jnp.isfinite(state["q"])) & jnp.all(
            jnp.isfinite(state["qd"]))
        done = jnp.logical_not(finite & (z >= 1.0) & (z <= 2.0))
        info = dict(reward_linvel=lin_vel_cost,
                    reward_quadctrl=-quad_ctrl_cost,
                    reward_alive=alive_bonus,
                    reward_impact=-quad_impact_cost)
        return state, self._obs(state, task), reward, done, info


@register_env("HumanoidRandDirecEnv")
@dataclass(frozen=True)
class HumanoidRandDirecEnv(HumanoidBase):
    """Task in {-1,+1}; reward = 0.25*dir*d(com_x)/timestep - costs + 5
    alive (humanoid_rand_direc.py:43-56)."""

    def sample_tasks(self, key, n_tasks):
        return jnp.where(jax.random.bernoulli(key, 0.5, (n_tasks,)),
                         1.0, -1.0)

    def step(self, state, action, task, key):
        pos_before = self._mass_center_xy(state, task)[0]
        state = self._advance(state, action, task)
        pos_after = self._mass_center_xy(state, task)[0]
        lin_vel_cost = (0.25 * task * (pos_after - pos_before)
                        / self.model.timestep)
        return self._step_common(state, action, task, lin_vel_cost)


@register_env("HumanoidRandDirec2DEnv")
@dataclass(frozen=True)
class HumanoidRandDirec2DEnv(HumanoidBase):
    """Unit-vector tasks; reward projects the com displacement
    (humanoid_rand_direc_2d.py:44-55)."""

    def sample_tasks(self, key, n_tasks):
        d = jax.random.normal(key, (n_tasks, 2))
        return d / jnp.linalg.norm(d, axis=1, keepdims=True)

    def step(self, state, action, task, key):
        pos_before = self._mass_center_xy(state, task)
        state = self._advance(state, action, task)
        pos_after = self._mass_center_xy(state, task)
        lin_vel_cost = (0.25 * jnp.sum(task * (pos_after - pos_before))
                        / self.model.timestep)
        return self._step_common(state, action, task, lin_vel_cost)
