"""Single-rollout collection with optional rendering/video export.

Analog of the reference's ``samplers/utils.py`` rollout helper (reference:
meta_policy_search/samplers/utils.py:5-66 — single-env rollout with
optional mp4/gif saving; unused by the training path). MuJoCo viewers
don't exist for the JAX engine, so rendering is matplotlib-based:

  * point envs: 2D trajectory plot with goal markers
  * locomotion envs: stick-figure frames from the engine's forward
    kinematics (body positions + capsule axes), saved as GIF/MP4 when
    matplotlib + pillow/ffmpeg are available
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def rollout(env, policy, params, task, key, max_path_length=100,
            floor_std=True):
    """Collect one episode; returns dict of (T, ...) arrays + states.

    Mirrors the reference rollout contract (observations, actions, rewards,
    agent_infos, env_infos) with states kept for rendering.
    """
    k_reset, k_run = jax.random.split(jax.random.PRNGKey(key)
                                      if isinstance(key, int) else key)
    state, obs = env.reset(k_reset, task)

    @jax.jit
    def step_fn(carry, k):
        state, obs = carry
        ka, ks = jax.random.split(k)
        action, dist = policy.act(params, obs, ka, floor_std=floor_std)
        state, obs2, reward, done, info = env.step(state, action, task, ks)
        out = dict(observations=obs, actions=action, rewards=reward,
                   dones=done, agent_infos=dist, env_infos=info,
                   states=state)
        return (state, obs2), out

    _, traj = jax.lax.scan(step_fn, (state, obs),
                           jax.random.split(k_run, max_path_length))
    return jax.device_get(traj)


def render_point_trajectory(traj, task=None, save_path=None):
    """2D path plot for the point envs; returns the matplotlib figure."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    obs = np.asarray(traj["observations"])[:, :2]
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.plot(obs[:, 0], obs[:, 1], "-o", markersize=2, linewidth=1)
    ax.plot(obs[0, 0], obs[0, 1], "gs", label="start")
    if task is not None:
        goal = np.asarray(task).reshape(-1)[:2]
        ax.plot(goal[0], goal[1], "r*", markersize=14, label="goal")
    ax.set_xlim(-3, 3)
    ax.set_ylim(-3, 3)
    ax.legend()
    if save_path:
        fig.savefig(save_path, dpi=80)
    return fig


def render_locomotion_video(env, traj, save_path, fps=20, max_frames=200):
    """Stick-figure animation from engine FK; saves GIF (pillow writer)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.animation as animation
    import matplotlib.pyplot as plt

    eng = env.engine
    states_q = np.asarray(traj["states"]["q"])[:max_frames]
    fk = jax.jit(eng.fk)
    frames = [np.asarray(fk(jnp.asarray(q))["body_pos"]) for q in states_q]
    parents = eng.model.body_parent

    fig, ax = plt.subplots(figsize=(6, 4))
    lines = [ax.plot([], [], "o-", linewidth=2)[0]
             for _ in range(len(parents))]
    ground, = ax.plot([-100, 100], [0, 0], "k-", linewidth=1)
    ax.set_ylim(-0.5, 2.5)

    def update(i):
        pos = frames[i]
        x0 = pos[0, 0]
        if not np.isfinite(x0):
            return lines
        ax.set_xlim(x0 - 2, x0 + 2)
        for b, line in enumerate(lines):
            p = parents[b]
            if p < 0:
                line.set_data([pos[b, 0]], [pos[b, 2]])
            else:
                line.set_data([pos[p, 0], pos[b, 0]],
                              [pos[p, 2], pos[b, 2]])
        return lines

    anim = animation.FuncAnimation(fig, update, frames=len(frames),
                                   blit=False)
    anim.save(save_path, writer="pillow", fps=fps)
    plt.close(fig)
    return save_path
