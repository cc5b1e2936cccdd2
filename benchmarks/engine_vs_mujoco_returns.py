"""Quantify the engine-vs-MuJoCo return-scale gap with MATCHED rollouts
(VERDICT r4 item 6: turn RESULTS §8's hypothesis (b) into a number).

For hopper and walker2d: identical initial states and identical action
sequences are stepped through (a) the in-house engine exactly as the
rand-params envs run it (Engine.step at the env's frame_skip/n_substeps)
and (b) the real installed MuJoCo (mj_step x frame_skip on the same
gymnasium MJCF). Both sides then get the SAME reward formula
(v_x + 1 alive - 1e-3 ||a||^2 — the gym/rand-param semantics our envs
mirror) and the SAME healthy/done test, so any difference in per-step
reward, alive-height distribution, or episode length is attributable to
the physics, not the env code.

Run:  python benchmarks/engine_vs_mujoco_returns.py [--rollouts 32]
Writes benchmarks/diag/engine_vs_mujoco_returns.json.
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

MODELS = {
    # model: (frame_skip, healthy(q) -> bool)
    "hopper": (4, lambda q: (q[1] > 0.7) and (abs(q[2]) < 0.2)
               and np.all(np.abs(q[2:]) < 100.0)),
    "walker2d": (8, lambda q: (0.8 < q[1] < 2.0) and (abs(q[2]) < 1.0)),
}


def mujoco_rollout(name, frame_skip, healthy, q0, qd0, actions):
    import gymnasium
    import mujoco

    assets = os.path.join(os.path.dirname(gymnasium.__file__),
                          "envs/mujoco/assets")
    m = mujoco.MjModel.from_xml_path(os.path.join(assets, f"{name}.xml"))
    d = mujoco.MjData(m)
    d.qpos[:] = q0
    d.qvel[:] = qd0
    mujoco.mj_forward(m, d)
    dt = m.opt.timestep * frame_skip
    rewards, heights, alive = [], [], []
    length = len(actions)
    for t, a in enumerate(actions):
        x_before = d.qpos[0]
        d.ctrl[:] = a
        for _ in range(frame_skip):
            mujoco.mj_step(m, d)
        v = (d.qpos[0] - x_before) / dt
        rewards.append(v + 1.0 - 1e-3 * float(np.square(a).sum()))
        heights.append(float(d.qpos[1]))
        ok = healthy(np.asarray(d.qpos))
        alive.append(ok)
        if not ok:
            length = t + 1
            break
    return np.array(rewards), np.array(heights), length


def engine_rollout(name, frame_skip, healthy, q0, qd0, actions):
    import jax
    import jax.numpy as jnp

    from promp_tpu.envs.mujoco.engine import Engine
    from promp_tpu.envs.mujoco.model import get_model

    eng = Engine(get_model(name), n_substeps=1)
    dt = eng.model.timestep * frame_skip
    q = jnp.asarray(q0, jnp.float32)
    qd = jnp.asarray(qd0, jnp.float32)
    step = jax.jit(lambda q, qd, a: eng.step(q, qd, a, frame_skip))
    rewards, heights = [], []
    length = len(actions)
    for t, a in enumerate(actions):
        x_before = float(q[0])
        q, qd = step(q, qd, jnp.asarray(a, jnp.float32))
        qn = np.asarray(q)
        v = (float(q[0]) - x_before) / dt
        rewards.append(v + 1.0 - 1e-3 * float(np.square(a).sum()))
        heights.append(float(qn[1]))
        if not healthy(qn):
            length = t + 1
            break
    return np.array(rewards), np.array(heights), length


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rollouts", type=int, default=32)
    ap.add_argument("--horizon", type=int, default=200)
    ap.add_argument("--action-scale", type=float, default=0.5)
    args = ap.parse_args()

    out = {}
    rng = np.random.RandomState(0)
    for name, (frame_skip, healthy) in MODELS.items():
        from promp_tpu.envs.mujoco.model import get_model
        model = get_model(name)
        res = {"mujoco": {"rewards": [], "heights": [], "lengths": []},
               "engine": {"rewards": [], "heights": [], "lengths": []}}
        for k in range(args.rollouts):
            q0 = model.init_qpos + rng.uniform(-0.005, 0.005, model.nv)
            qd0 = rng.uniform(-0.005, 0.005, model.nv)
            acts = (args.action_scale
                    * rng.uniform(-1, 1, (args.horizon, model.nu)))
            for side, roll in (("mujoco", mujoco_rollout),
                               ("engine", engine_rollout)):
                r, h, L = roll(name, frame_skip, healthy, q0, qd0, acts)
                res[side]["rewards"].append(float(r.sum()))
                res[side]["heights"].append(float(h.mean()))
                res[side]["lengths"].append(int(L))
        summary = {}
        for side in ("mujoco", "engine"):
            d = res[side]
            summary[side] = dict(
                mean_return=float(np.mean(d["rewards"])),
                mean_episode_len=float(np.mean(d["lengths"])),
                median_episode_len=float(np.median(d["lengths"])),
                mean_height=float(np.mean(d["heights"])),
                mean_reward_per_alive_step=float(
                    np.sum(d["rewards"]) / max(np.sum(d["lengths"]), 1)),
            )
        summary["episode_len_ratio_engine_over_mujoco"] = round(
            summary["engine"]["mean_episode_len"]
            / max(summary["mujoco"]["mean_episode_len"], 1e-9), 3)
        summary["return_gap_engine_minus_mujoco"] = round(
            summary["engine"]["mean_return"]
            - summary["mujoco"]["mean_return"], 2)
        out[name] = summary
        print(name, json.dumps(summary, indent=1), flush=True)

    os.makedirs("benchmarks/diag", exist_ok=True)
    with open("benchmarks/diag/engine_vs_mujoco_returns.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
