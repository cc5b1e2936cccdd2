"""Pallas TPU megakernel: fused whole-rollout for the point-mass benchmark.

Experimental fast path for the reference's headline workload
(MetaPointEnvCorner + diag-Gaussian MLP). The standard engine already runs
the rollout as one XLA scan; at point-mass sizes that scan is bound by
per-step bookkeeping (PRNG, buffer concatenation), not FLOPs. This kernel
keeps policy parameters, env state, the pre-generated noise stream and ALL
output buffers resident in VMEM for the entire horizon — one grid step per
meta-task, a fori_loop over time inside, zero HBM round-trips per env step:

    obs --MXU--> mean --VPU--> action --VPU--> env step + reward
        --> VMEM output row

Action noise is generated OUTSIDE the kernel with the session's
counter-based threefry PRNG and streamed from VMEM, so the kernel is a
pure deterministic function of (params, goals, obs0, noise) — verified
bitwise against a plain-JAX replay (tests/test_pallas.py). The general
rollout engine (promp_tpu/sampling/rollout.py) remains the default; this
is the benchmark fast path for the point-mass workload.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rollout_kernel(goal_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    w3_ref, b3_ref, logstd_ref, obs0_ref, noise_ref,
                    obs_out, act_out, rew_out, mean_out,
                    *, horizon, scale, act_bound, sparse_radius):
    # rank-2 per-task arrays carry a singleton axis after the task axis so
    # their (1, 1, d) blocks satisfy Mosaic's last-two-dims-equal-array
    # rule (the TPU lowering rejects (1, d) blocks of a (n_tasks, d) array)
    log_std = logstd_ref[0, 0, :]

    def step(t, obs):
        # policy forward (obs: (N, 2))
        h = jnp.tanh(jnp.dot(obs, w1_ref[0], preferred_element_type=jnp.float32)
                     + b1_ref[0, 0])
        h = jnp.tanh(jnp.dot(h, w2_ref[0], preferred_element_type=jnp.float32)
                     + b2_ref[0, 0])
        mean = jnp.dot(h, w3_ref[0],
                       preferred_element_type=jnp.float32) + b3_ref[0, 0]
        noise = noise_ref[0, t]
        action = mean + noise * jnp.exp(log_std)

        # NormalizedEnv action affine +-scale -> +-act_bound, then env clip
        scaled = -act_bound + (action + scale) * (2 * act_bound) / (2 * scale)
        scaled = jnp.clip(scaled, -act_bound, act_bound)

        new = obs + scaled
        goal = goal_ref[0, 0]
        goal_d = jnp.sqrt(jnp.sum((new - goal) ** 2, axis=-1))
        dist_l1 = jnp.sum(jnp.abs(new), axis=-1)
        # nearest-corner test (point_env_2d_corner.py:68-75); corners are
        # (+-2, +-2), expanded as scalar math (no captured constants)
        x, y = new[:, 0], new[:, 1]
        d2 = jnp.minimum(
            jnp.minimum((x + 2.0) ** 2 + (y + 2.0) ** 2,
                        (x - 2.0) ** 2 + (y + 2.0) ** 2),
            jnp.minimum((x + 2.0) ** 2 + (y - 2.0) ** 2,
                        (x - 2.0) ** 2 + (y - 2.0) ** 2))
        nearest = goal_d <= jnp.sqrt(d2) + 1e-7
        prev_d = jnp.sqrt(jnp.sum((obs - goal) ** 2, axis=-1))
        reward = jnp.where(dist_l1 < sparse_radius, 0.0,
                           jnp.where(nearest, prev_d - goal_d, 0.0))

        obs_out[0, pl.ds(t, 1)] = obs[None]
        act_out[0, pl.ds(t, 1)] = action[None]
        mean_out[0, pl.ds(t, 1)] = mean[None]
        rew_out[0, pl.ds(t, 1)] = reward[None]
        return new

    jax.lax.fori_loop(0, horizon, step, obs0_ref[0], unroll=False)


@functools.partial(jax.jit, static_argnames=("horizon", "interpret"))
def pallas_pointmass_rollout(task_params, goals, obs0, key, horizon=100,
                             interpret=False):
    """Fused rollout for MetaPointEnvCorner (sparse reward, normalize(10)).

    Args:
        task_params: policy params pytree with leading task axis (64x64
            tanh MLP naming from GaussianMLPPolicy).
        goals: (n_tasks, 2) corner goals.
        obs0: (n_tasks, n_envs, 2) initial states (from env.reset).
        key: PRNG key; action noise is pre-generated outside the kernel
            (counter-based threefry) and streamed from VMEM, keeping the
            kernel deterministic given the noise buffer.
        horizon: steps per rollout.

    Returns:
        dict with observations (n_tasks, n_envs, T, 2) -> transposed to
        match the engine layout, actions, rewards, agent_infos.
    """
    n_tasks, n_envs, _ = obs0.shape
    w1 = task_params["mean_network/hidden_0/kernel"]
    b1 = task_params["mean_network/hidden_0/bias"]
    w2 = task_params["mean_network/hidden_1/kernel"]
    b2 = task_params["mean_network/hidden_1/bias"]
    w3 = task_params["mean_network/output/kernel"]
    b3 = task_params["mean_network/output/bias"]
    log_std = task_params["log_std_network/log_std_var"][:, 0, :]

    hidden0 = w1.shape[-1]
    hidden1 = w2.shape[-1]
    act_dim = w3.shape[-1]
    noise = jax.random.normal(key, (n_tasks, horizon, n_envs, act_dim),
                              jnp.float32)

    kernel = functools.partial(
        _rollout_kernel, horizon=horizon, scale=10.0, act_bound=0.2,
        sparse_radius=0.5)

    grid = (n_tasks,)
    task_block = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct((n_tasks, horizon, n_envs, 2), jnp.float32),
        jax.ShapeDtypeStruct((n_tasks, horizon, n_envs, act_dim),
                             jnp.float32),
        jax.ShapeDtypeStruct((n_tasks, horizon, n_envs), jnp.float32),
        jax.ShapeDtypeStruct((n_tasks, horizon, n_envs, act_dim),
                             jnp.float32),
    ]
    out_specs = [
        task_block(horizon, n_envs, 2),
        task_block(horizon, n_envs, act_dim),
        task_block(horizon, n_envs),
        task_block(horizon, n_envs, act_dim),
    ]
    obs, act, rew, mean = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            task_block(1, 2),                        # goal
            task_block(2, hidden0),
            task_block(1, hidden0),
            task_block(hidden0, hidden1),
            task_block(1, hidden1),
            task_block(hidden1, act_dim),
            task_block(1, act_dim),
            task_block(1, act_dim),                  # log_std
            task_block(n_envs, 2),                   # obs0
            task_block(horizon, n_envs, act_dim),    # noise
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=pltpu.InterpretParams() if interpret else False,
    )(goals[:, None], w1, b1[:, None], w2, b2[:, None], w3, b3[:, None],
      log_std[:, None], obs0, noise)

    to_env_layout = lambda x: jnp.swapaxes(x, 1, 2)
    log_std_b = jnp.broadcast_to(
        log_std[:, None, None, :], mean.shape)
    return dict(
        observations=to_env_layout(obs),
        actions=to_env_layout(act),
        rewards=to_env_layout(rew),
        agent_infos=dict(mean=to_env_layout(mean),
                         log_std=to_env_layout(log_std_b)),
    )
