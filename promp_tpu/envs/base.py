"""Meta-environment protocol: pure functions over explicit state.

TPU-native analog of the reference's ``MetaEnv`` task API (reference:
meta_policy_search/envs/base.py:6-49 — ``sample_tasks / set_task / get_task /
step / reset``). The reference mutates a Python object per env copy and runs
one OS process per meta-task (vectorized_env_executor.py:88-234); here an
environment is a frozen config dataclass with pure methods

    sample_tasks(key, n)            -> task pytree, leading axis n
    reset(key, task)                -> (state, obs)
    step(state, action, task, key)  -> (state, obs, reward, done, info)

so the whole (task x env) batch steps under ``jit``/``vmap`` inside the
rollout scan — no processes, no pipes, no host round-trips (SURVEY.md §2.9
P1/P2). ``info`` must be a fixed-structure dict of scalars (static shapes).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax.numpy as jnp

# Registry mapping reference class names -> our constructors, so run-script
# configs written for the reference (e.g. {'env': 'MetaPointEnvCorner'})
# resolve directly (pro-mp_run_point_mass.py:25-27 uses globals() lookup).
ENV_REGISTRY: Dict[str, Any] = {}


def register_env(name):
    def deco(cls):
        ENV_REGISTRY[name] = cls
        return cls
    return deco


def make_env(name, **kwargs):
    if name not in ENV_REGISTRY:
        raise KeyError(f"Unknown env '{name}'. Known: {sorted(ENV_REGISTRY)}")
    return ENV_REGISTRY[name](**kwargs)


@dataclass(frozen=True)
class Box:
    """Minimal bounds descriptor (replaces gym.spaces.Box usage)."""
    low: float
    high: float
    shape: Tuple[int, ...]

    @property
    def dim(self):
        d = 1
        for s in self.shape:
            d *= s
        return d

    def low_array(self):
        return jnp.full(self.shape, self.low, jnp.float32)

    def high_array(self):
        return jnp.full(self.shape, self.high, jnp.float32)


class TaskEnv:
    """Duck-typed protocol; concrete envs are frozen dataclasses.

    Required attributes/properties:
        observation_space: Box
        action_space: Box
    Required methods: sample_tasks, reset, step (signatures above).
    Optional:
      * ``diagnostics_keys`` — names from the step info dict to aggregate
        per iteration (the analog of MetaEnv.log_diagnostics)
      * ``never_done`` — True when episodes cannot terminate early; lets
        the rollout engine drop the auto-reset branch from the compiled
        scan body (smaller XLA program, faster compile)
      * ``stochastic_step`` — False when ``step`` ignores its PRNG key;
        drops the per-step key splits from the scan body
    """

    diagnostics_keys: Tuple[str, ...] = ()
    never_done: bool = False
    stochastic_step: bool = False

    def reset_carry(self, prev_state, key, task):
        """Reset for in-scan auto-resets, given the terminated episode's
        final state. Default ignores it; wrappers carrying running
        statistics (NormalizedEnv's EMA obs/reward stats, reference
        normalized_env.py:37,91 — instance attrs that survive resets)
        override this to persist them across episode boundaries."""
        return self.reset(key, task)

    def diagnostics(self, samples):
        """Per-iteration env diagnostics — the analog of the reference's
        ``MetaEnv.log_diagnostics(paths, prefix)`` (envs/base.py:44-49,
        called per sampling round at meta_trainer.py:109) — computed from
        the batched samples dict (leaves shaped (tasks, envs, T, ...)).
        Must be jit-compatible (pure jnp; returns a dict of scalars).
        Default: the mean of each ``diagnostics_keys`` env_info, as
        ``Env-<key>``. Envs whose reference counterpart defines
        log_diagnostics override this with the reference's exact stat
        names/spreads (Average/Max/Min/Std)."""
        out = {}
        infos = samples.get("env_infos", {})
        for k in self.diagnostics_keys:
            if k in infos:
                out[f"Env-{k}"] = jnp.mean(infos[k])
        return out

    @property
    def obs_dim(self):
        return self.observation_space.dim

    @property
    def action_dim(self):
        return self.action_space.dim
