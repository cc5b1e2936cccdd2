"""Physics-randomizing meta-env wrapper (rand-param family).

Pure-function port of the reference's ``RandomEnv`` (reference:
meta_policy_search/envs/base.py:51-136) and of the external
``dennisl88/rand_param_envs`` hopper/walker/cheetah envs the reference
depends on (requirements.txt:13). Tasks are per-parameter multiplier
pytrees:

  * body_mass     x 1.5^U(-L, L)   (base.py:86-88)
  * body_inertia  x 1.5^U(-L, L)   (:91-93)
  * dof_damping   x 1.3^U(-L, L)   (:96-98)
  * friction      x 1.5^U(-L, L)   (:101-103, geom_friction lumped to the
                                    engine's ground friction coefficient)

with L = ``log_scale_limit`` (rand_param_envs uses 3.0 by default). The
multipliers flow into the engine as `mods` (physics overrides applied
inside jit) instead of mutating a MuJoCo model, so every env instance in
the (task, env) batch can run different physics simultaneously.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from promp_tpu.envs.base import register_env
from promp_tpu.envs.mujoco.locomotion import (
    HopperEnv, LocomotionEnv, Walker2dBase)

RAND_PARAMS = ("body_mass", "dof_damping", "body_inertia", "friction")


def sample_param_multipliers(key, model, n_tasks, log_scale_limit,
                             rand_params=RAND_PARAMS):
    """Multiplier pytree with leading task axis (base.py:69-108)."""
    keys = jax.random.split(key, 4)
    out = {}
    L = log_scale_limit
    if "body_mass" in rand_params:
        out["body_mass"] = 1.5 ** jax.random.uniform(
            keys[0], (n_tasks, model.nb), jnp.float32, -L, L)
    if "body_inertia" in rand_params:
        out["body_inertia"] = 1.5 ** jax.random.uniform(
            keys[1], (n_tasks, model.nb, 3), jnp.float32, -L, L)
    if "dof_damping" in rand_params:
        out["dof_damping"] = 1.3 ** jax.random.uniform(
            keys[2], (n_tasks, model.nv), jnp.float32, -L, L)
    if "friction" in rand_params:
        out["friction"] = 1.5 ** jax.random.uniform(
            keys[3], (n_tasks,), jnp.float32, -L, L)
    return out


class RandParamsMixin:
    """Adds multiplier tasks + engine mods to any LocomotionEnv subclass."""

    def sample_tasks(self, key, n_tasks):
        return sample_param_multipliers(key, self.model, n_tasks,
                                        self.log_scale_limit,
                                        self.rand_params)

    def _mods(self, task):
        return task


@register_env("HopperRandParamsEnv")
@dataclass(frozen=True)
class HopperRandParamsEnv(RandParamsMixin, HopperEnv):
    """rand_param_envs HopperRandParams analog."""

    log_scale_limit: float = 3.0
    rand_params: Tuple[str, ...] = RAND_PARAMS


@register_env("WalkerRandParamsWrappedEnv")
@register_env("Walker2DRandParamsEnv")
@dataclass(frozen=True)
class Walker2DRandParamsEnv(RandParamsMixin, Walker2dBase):
    """rand_param_envs WalkerRandParams analog. Reward = v_x + 1 alive
    - 1e-3||a||^2 (gym walker semantics, used by the rand-params suite)."""

    log_scale_limit: float = 3.0
    rand_params: Tuple[str, ...] = RAND_PARAMS

    def step(self, state, action, task, key):
        x_before = state["q"][0]
        state = self._advance(state, action, task)
        forward_vel = (state["q"][0] - x_before) / self.dt
        reward = forward_vel + 1.0 - 1e-3 * jnp.sum(jnp.square(action))
        return (state, self._obs(state, task), reward, self._done(state),
                dict(forward_vel=forward_vel))


@register_env("HalfCheetahRandParamsEnv")
@dataclass(frozen=True)
class HalfCheetahRandParamsEnv(RandParamsMixin, LocomotionEnv):
    """rand_param_envs HalfCheetahRandParams analog (cheetah dynamics,
    gym reward v_x - 0.05||a||^2)."""

    model_name: str = "half_cheetah"
    frame_skip: int = 5
    n_substeps: int = 1
    never_done: bool = True
    log_scale_limit: float = 3.0
    rand_params: Tuple[str, ...] = RAND_PARAMS

    def _obs_dim(self):
        return 2 * self.model.nv - 1

    def _obs(self, state, task=None):
        return jnp.concatenate([state["q"][1:], state["qd"]])

    def step(self, state, action, task, key):
        x_before = state["q"][0]
        state = self._advance(state, action, task)
        forward_vel = (state["q"][0] - x_before) / self.dt
        reward = forward_vel - 0.5 * 0.1 * jnp.sum(jnp.square(action))
        return (state, self._obs(state, task), reward, jnp.array(False),
                dict(forward_vel=forward_vel))
