"""Ant meta-envs (3D quadruped, free-root decomposed to 6 DoF).

Pure-function ports of the reference's ant envs (reference:
meta_policy_search/envs/mujoco_envs/ant_rand_goal.py, ant_rand_direc.py,
ant_rand_direc_2d.py). The engine represents the free root as 3 world
slides + 3 intrinsic-xyz Euler hinges; observations re-assemble the
MuJoCo-convention qpos (position + quaternion) so dimensions match the
reference exactly, and cfrc_ext is replaced by the engine's per-body
contact wrench (clipped +-1, mostly saturated/zero — ant_rand_goal.py:55).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from promp_tpu.envs.base import register_env
from promp_tpu.envs.mujoco.locomotion import LocomotionEnv
from promp_tpu.envs.mujoco.rotations import quat_from_euler_xyz


@dataclass(frozen=True)
class AntBase(LocomotionEnv):
    """Reset noise qpos U(-.1,.1), qvel N(0,.1)·1 (ant_rand_goal.py:60-64);
    frame_skip 5."""

    model_name: str = "ant"
    frame_skip: int = 5
    # light feet + k=1e4 penalties: implicit contact terms in the solve
    # are stable at h=2.5e-3 (round 1's explicit contacts needed nsub=8)
    n_substeps: int = 2
    qpos_noise: float = 0.1
    qvel_noise: float = 0.1
    stochastic_step: bool = False
    diagnostics_keys = ("reward_forward", "reward_ctrl")

    def _qpos_mj(self, q):
        """Engine coords -> MuJoCo-convention qpos (pos3, quat4, hinges)."""
        quat = quat_from_euler_xyz(q[3], q[4], q[5])
        return jnp.concatenate([q[:3], quat, q[6:]])

    def _cfrc(self, state, task):
        wrench = self.engine.contact_wrench(state["q"], state["qd"],
                                            self._mods(task))
        # world row first, like MuJoCo's (nbody, 6) cfrc_ext
        world = jnp.zeros((1, 6), wrench.dtype)
        return jnp.clip(jnp.concatenate([world, wrench]), -1.0, 1.0)

    def _torso_xy(self, state):
        return state["q"][:2]


@register_env("AntRandGoalEnv")
@dataclass(frozen=True)
class AntRandGoalEnv(AntBase):
    """Goal in disk r<=3 via polar sampling (ant_rand_goal.py:13-16);
    reward = -L1(torso_xy, goal) - 0.1||a||^2 - contact cost (:32-50);
    obs = [qpos, qvel, clip(cfrc_ext)] (:52-58); never done."""

    def sample_tasks(self, key, n_tasks):
        ka, kr = jax.random.split(key)
        a = jax.random.uniform(ka, (n_tasks,), jnp.float32, 0.0,
                               2.0 * jnp.pi)
        r = 3.0 * jax.random.uniform(kr, (n_tasks,), jnp.float32) ** 0.5
        return jnp.stack([r * jnp.cos(a), r * jnp.sin(a)], axis=-1)

    def _obs_dim(self):
        return (self.model.nv + 1) + self.model.nv + 6 * (self.model.nb + 1)

    def _obs(self, state, task):
        cfrc = self._cfrc(state, task)
        return jnp.concatenate([self._qpos_mj(state["q"]), state["qd"],
                                cfrc.reshape(-1)])

    def step(self, state, action, task, key):
        state = self._advance(state, action, task)
        goal_reward = -jnp.sum(jnp.abs(self._torso_xy(state) - task))
        ctrl_cost = 0.1 * jnp.sum(jnp.square(action))
        cfrc = self._cfrc(state, task)
        contact_cost = 0.5 * 1e-3 * jnp.sum(jnp.square(cfrc))
        reward = goal_reward - ctrl_cost - contact_cost
        info = dict(reward_forward=goal_reward, reward_ctrl=-ctrl_cost,
                    reward_contact=-contact_cost)
        return (state, self._obs(state, task), reward, jnp.array(False),
                info)

    def diagnostics(self, samples):
        """Mirror of ant_rand_goal.py:68-77: per-path mean of
        reward_forward with Average/Max/Min/Std spreads, plus the mean
        per-path ctrl cost."""
        out = super().diagnostics(samples)
        progs = jnp.mean(samples["env_infos"]["reward_forward"], axis=-1)
        ctrl = jnp.mean(-samples["env_infos"]["reward_ctrl"], axis=-1)
        out["AverageForwardReturn"] = jnp.mean(progs)
        out["MaxForwardReturn"] = jnp.max(progs)
        out["MinForwardReturn"] = jnp.min(progs)
        out["StdForwardReturn"] = jnp.std(progs)
        out["AverageCtrlCost"] = jnp.mean(ctrl)
        return out


@register_env("AntRandDirecEnv")
@dataclass(frozen=True)
class AntRandDirecEnv(AntBase):
    """Task in {-1,+1} (ant_rand_direc.py:14-18); reward = dir*v_x -
    0.5||a||^2 - contact + 1 alive (:32-50); obs = [qpos[2:], qvel,
    clip(cfrc)] (:53-58); done when torso z leaves [0, 1] (:44-45)."""

    def sample_tasks(self, key, n_tasks):
        return jnp.where(jax.random.bernoulli(key, 0.5, (n_tasks,)),
                         1.0, -1.0)

    def _obs_dim(self):
        return (self.model.nv - 1) + self.model.nv + 6 * (self.model.nb + 1)

    def _obs(self, state, task):
        cfrc = self._cfrc(state, task)
        return jnp.concatenate([self._qpos_mj(state["q"])[2:], state["qd"],
                                cfrc.reshape(-1)])

    def _direction_reward(self, task, state, x_before):
        return task * (state["q"][0] - x_before) / self.dt

    def step(self, state, action, task, key):
        x_before = state["q"][0]
        state = self._advance(state, action, task)
        forward_reward = self._direction_reward(task, state, x_before)
        ctrl_cost = 0.5 * jnp.sum(jnp.square(action))
        cfrc = self._cfrc(state, task)
        contact_cost = 0.5 * 1e-3 * jnp.sum(jnp.square(cfrc))
        survive_reward = 1.0
        reward = forward_reward - ctrl_cost - contact_cost + survive_reward
        z = state["q"][2]
        finite = jnp.all(jnp.isfinite(state["q"])) & jnp.all(
            jnp.isfinite(state["qd"]))
        done = jnp.logical_not(finite & (z >= 0.0) & (z <= 1.0))
        info = dict(reward_forward=forward_reward, reward_ctrl=-ctrl_cost,
                    reward_contact=-contact_cost,
                    reward_survive=survive_reward)
        return state, self._obs(state, task), reward, done, info


@register_env("AntRandDirec2DEnv")
@dataclass(frozen=True)
class AntRandDirec2DEnv(AntRandDirecEnv):
    """Unit-vector direction tasks (ant_rand_direc_2d.py:15-19); reward
    projects torso COM displacement onto the goal direction (:34-38)."""

    def sample_tasks(self, key, n_tasks):
        d = jax.random.normal(key, (n_tasks, 2))
        return d / jnp.linalg.norm(d, axis=1, keepdims=True)

    def _direction_reward(self, task, state, xy_before):
        return jnp.sum(task * (self._torso_xy(state) - xy_before)) / self.dt

    def step(self, state, action, task, key):
        xy_before = self._torso_xy(state)
        state = self._advance(state, action, task)
        forward_reward = self._direction_reward(task, state, xy_before)
        ctrl_cost = 0.5 * jnp.sum(jnp.square(action))
        cfrc = self._cfrc(state, task)
        contact_cost = 0.5 * 1e-3 * jnp.sum(jnp.square(cfrc))
        survive_reward = 1.0
        reward = forward_reward - ctrl_cost - contact_cost + survive_reward
        z = state["q"][2]
        finite = jnp.all(jnp.isfinite(state["q"])) & jnp.all(
            jnp.isfinite(state["qd"]))
        done = jnp.logical_not(finite & (z >= 0.2) & (z <= 1.0))
        info = dict(reward_forward=forward_reward, reward_ctrl=-ctrl_cost,
                    reward_contact=-contact_cost,
                    reward_survive=survive_reward)
        return state, self._obs(state, task), reward, done, info
