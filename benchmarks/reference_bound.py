"""Measure an optimistic per-step host-overhead bound for the reference
stack (VERDICT r2 item 9: replace the bare 15k steps/s estimate with a
measurement).

The reference's sampling loop (SURVEY.md §3.2, meta_sampler.py:87-128)
pays, per env step, on the host:

  1. a policy forward for ALL (meta_batch_size * envs_per_task) envs —
     sess.run of a (64,64) MLP + numpy action noise
     (meta_gaussian_mlp_policy.py:118-157, gaussian_mlp_policy.py:110-116);
  2. one multiprocessing.Pipe round-trip PER META-TASK: pickle the task's
     action block, unpickle the (obs, reward, done, info) result tuples
     (vectorized_env_executor.py:119-144);
  3. a Python env.step call per env inside the workers (:205-214), plus
     the parent's per-env bookkeeping loop appending to running_paths
     (meta_sampler.py:105-128).

This script times numpy/pickle/python stand-ins for exactly those pieces
on THIS host and prints the implied env-steps/s upper bound for the
reference's default point-mass workload (40 tasks x 20 envs, obs_dim 2).
It is an OPTIMISTIC bound: it omits TF session dispatch overhead, the
feed-dict construction (which for post-update sampling re-feeds every
adapted parameter array every step, meta_gaussian_mlp_policy.py:139-157),
process scheduling, and pipe syscall latency (we pickle to bytes in
memory instead of writing through a socket).

`--workload cheetah` (VERDICT r3 item 1a) calibrates the bound for
HalfCheetahRandVel instead: 20-dim obs / 6-dim action payloads, and the
env.step term is the REAL installed MuJoCo (mj_step x frame_skip 5 on
gymnasium's half_cheetah.xml — the reference's own physics C library,
half_cheetah_rand_vel.py:5-14, frame_skip=5) plus the python-level obs
assembly and reward the reference computes per step. Worker-side physics
is granted PERFECT parallel speedup across all host cores (the reference
runs meta_batch_size worker processes, vectorized_env_executor.py:160-178)
while the parent-side terms (policy forward, pipe pickling, bookkeeping)
stay serial, as they are in meta_sampler.py's parent loop. Still
optimistic: no TF dispatch, no scheduling, in-memory pickles.

Run:  python benchmarks/reference_bound.py [--workload cheetah]
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import time

import numpy as np

META_BATCH = 40
ENVS_PER_TASK = 20
N_ENVS = META_BATCH * ENVS_PER_TASK


def timeit(fn, min_time=0.5):
    fn()  # warmup
    n, t0 = 0, time.perf_counter()
    while True:
        fn()
        n += 1
        dt = time.perf_counter() - t0
        if dt > min_time:
            return dt / n


MUJOCO_WORKLOADS = {
    # xml asset, frame_skip, python-side per-step obs/reward builder name
    "cheetah": ("half_cheetah.xml", 5),
    "ant": ("ant.xml", 5),
    "humanoid": ("humanoid.xml", 5),
    # rand-params family (reference: external rand_param_envs package,
    # gym hopper/walker dynamics + per-task physics multipliers; the
    # multiplier rewrite happens at reset, so per-step cost is the
    # same mj_step + obs/reward arithmetic)
    "hopper_rp": ("hopper.xml", 4),
    "walker_rp": ("walker2d.xml", 8),
}


def mujoco_step_cost(workload):
    """Per-env-step cost of the reference's physics for ``workload``,
    measured with the REAL MuJoCo library on this host: frame_skip x
    mj_step + the python obs/reward work the reference env does per step.

    cheetah: half_cheetah_rand_vel.py:16-30 (obs concat + reward arith).
    ant:     ant_rand_goal.py:32-58 (obs = qpos, qvel, clip(cfrc_ext);
             L1 goal reward + ctrl and contact costs).
    humanoid: humanoid_rand_direc.py:34-56 (obs = qpos[2:], qvel, cinert,
             cvel, qfrc_actuator, cfrc_ext; mass_center reward + costs).
    """
    import gymnasium
    import mujoco

    xml, frame_skip = MUJOCO_WORKLOADS[workload]
    assets = os.path.join(os.path.dirname(gymnasium.__file__),
                          "envs/mujoco/assets")
    m = mujoco.MjModel.from_xml_path(os.path.join(assets, xml))
    d = mujoco.MjData(m)
    rng = np.random.RandomState(0)
    actions = rng.uniform(-1, 1, (64, m.nu))
    mass = np.expand_dims(m.body_mass, 1)
    goal = np.array([1.0, 1.0])

    def one_env_step(i=[0]):
        a = actions[i[0] % 64]
        i[0] += 1
        d.ctrl[:] = a
        for _ in range(frame_skip):
            mujoco.mj_step(m, d)
        # python-side per-step work (reference env.step body)
        if workload == "cheetah":
            obs = np.concatenate([d.qpos.flat[1:], d.qvel.flat,
                                  d.subtree_com[1].flat])
            fwd_vel = d.qvel[0]
            reward = -np.abs(fwd_vel - 1.0) - 0.05 * np.sum(np.square(a))
        elif workload == "ant":
            cfrc = np.clip(d.cfrc_ext, -1, 1)
            obs = np.concatenate([d.qpos.flat, d.qvel.flat, cfrc.flat])
            reward = (-np.sum(np.abs(d.qpos[:2] - goal))
                      - 0.1 * np.square(a).sum()
                      - 0.5e-3 * np.square(cfrc).sum())
        elif workload in ("hopper_rp", "walker_rp"):
            # rand_param_envs hopper/walker step: obs = [qpos[1:],
            # clip(qvel, -10, 10)], reward = vel + 1 alive - 1e-3||a||^2
            obs = np.concatenate([d.qpos.flat[1:],
                                  np.clip(d.qvel.flat, -10, 10)])
            reward = d.qvel[0] + 1.0 - 1e-3 * np.sum(np.square(a))
        else:  # humanoid
            obs = np.concatenate([d.qpos.flat[2:], d.qvel.flat,
                                  d.cinert.flat, d.cvel.flat,
                                  d.qfrc_actuator.flat, d.cfrc_ext.flat])
            pos = (np.sum(mass * d.xipos, 0) / np.sum(mass))[0]
            reward = (0.25 * pos / m.opt.timestep
                      - 0.1 * np.square(a).sum()
                      + min(0.5e-6 * np.square(d.cfrc_ext).sum(), 10.0) + 5.0)
        return obs, reward

    return timeit(one_env_step, min_time=1.0)


OBS_ACT_DIMS = {
    # reference observation/action dims per workload (the pipe payload +
    # policy-forward sizes): cheetah 20/6 (half_cheetah_rand_vel.py),
    # ant 111/8 = 15 qpos + 14 qvel + 14*6 cfrc (ant_rand_goal.py:52-58),
    # humanoid 376/17 (humanoid_rand_direc.py:34-41)
    "pointmass": (2, 2),
    "cheetah": (20, 6),
    "ant": (111, 8),
    "humanoid": (376, 17),
    # hopper 11/3, walker 17/6: qpos[1:] + qvel (rand_param_envs gym
    # dynamics; matches envs/mujoco/rand_params.py obs dims)
    "hopper_rp": (11, 3),
    "walker_rp": (17, 6),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="pointmass",
                    choices=["pointmass", "cheetah", "ant", "humanoid",
                             "hopper_rp", "walker_rp"])
    ap.add_argument("--update-json", action="store_true",
                    help="merge the measured bound into benchmarks/"
                         "bounds.json (read by bench.py for vs_baseline)")
    args = ap.parse_args()
    obs_dim, act_dim = OBS_ACT_DIMS[args.workload]

    rng = np.random.RandomState(0)
    obs = rng.randn(N_ENVS, obs_dim).astype(np.float64)
    w0 = rng.randn(obs_dim, 64) * 0.1
    w1 = rng.randn(64, 64) * 0.1
    w2 = rng.randn(64, act_dim) * 0.1
    log_std = np.zeros(act_dim)

    def policy_forward():
        h = np.tanh(obs @ w0)
        h = np.tanh(h @ w1)
        mean = h @ w2
        return mean + rng.normal(size=mean.shape) * np.exp(log_std)

    actions = policy_forward()
    per_task_actions = np.split(actions, META_BATCH)

    def pipe_round_trip():
        # parent->worker: per-task action block; worker->parent: per-env
        # (obs, reward, done, info) tuples (vectorized_env_executor.py:
        # 137-144, 205-214) — both directions pickled
        for a in per_task_actions:
            blob = pickle.dumps(a, protocol=pickle.HIGHEST_PROTOCOL)
            pickle.loads(blob)
        results = [
            [(obs[0], 1.0, False, {}) for _ in range(ENVS_PER_TASK)]
            for _ in range(META_BATCH)
        ]
        for r in results:
            blob = pickle.dumps(r, protocol=pickle.HIGHEST_PROTOCOL)
            pickle.loads(blob)

    state = {"pos": np.zeros(obs_dim)}

    def env_step_one(a):
        # the reference point env's numpy step (point_env_2d_corner.py):
        # clip, integrate, reward branch — trivial numpy on tiny arrays
        a = np.clip(a, -0.2, 0.2)
        state["pos"] = state["pos"] + a
        reward = -np.sum(np.abs(state["pos"]))
        return state["pos"], reward, False, {}

    def env_steps():
        for a in actions:
            env_step_one(a)

    running = [dict(observations=[], actions=[], rewards=[])
               for _ in range(N_ENVS)]

    def bookkeeping():
        # meta_sampler.py:105-128: per-env python append loop
        for i in range(N_ENVS):
            r = running[i]
            r["observations"].append(obs[i])
            r["actions"].append(actions[i])
            r["rewards"].append(1.0)
        for r in running:
            r["observations"].clear(), r["actions"].clear()
            r["rewards"].clear()

    t_policy = timeit(policy_forward)
    t_pipe = timeit(pipe_round_trip)
    t_book = timeit(bookkeeping)
    ncores = os.cpu_count() or 1
    if args.workload in MUJOCO_WORKLOADS:
        # real MuJoCo physics, granted perfect parallel speedup over all
        # host cores (workers run concurrently; the parent terms cannot)
        t_env_serial_per_step = mujoco_step_cost(args.workload)
        t_env = t_env_serial_per_step * N_ENVS / ncores
        env_note = (f"real mujoco mj_step x5 ({t_env_serial_per_step*1e6:.1f}"
                    f" us/env-step serial) / {ncores} cores")
    else:
        t_env = timeit(env_steps)
        env_note = "python point-env step, serial"
    t_total = t_policy + t_pipe + t_env + t_book
    steps_per_s = N_ENVS / t_total

    if args.update_json:
        import platform
        path = os.path.join(os.path.dirname(__file__), "bounds.json")
        data = {}
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
        data.setdefault("bounds", {})
        # keep the HIGHEST measured bound (most optimistic for the
        # reference) unless the host fingerprint changed
        fp = f"{platform.node()}:{ncores}cores"
        if data.get("host") != fp:
            data = {"host": fp, "bounds": {}}
        prev = data["bounds"].get(args.workload, 0.0)
        data["bounds"][args.workload] = max(prev, round(steps_per_s, 1))
        with open(path, "w") as f:
            json.dump(data, f, indent=1)

    print(json.dumps({
        "workload": args.workload,
        "host_overhead_per_env_step_us": {
            "policy_forward": round(t_policy / N_ENVS * 1e6, 3),
            "pipe_pickle_round_trip": round(t_pipe / N_ENVS * 1e6, 3),
            "env_step": round(t_env / N_ENVS * 1e6, 3),
            "path_bookkeeping": round(t_book / N_ENVS * 1e6, 3),
        },
        "env_step_model": env_note,
        "implied_reference_env_steps_per_s_bound": round(steps_per_s, 1),
        "note": ("optimistic bound: omits TF sess.run dispatch, feed-dict "
                 "construction, process scheduling, and real socket "
                 "latency"),
    }, indent=1))


if __name__ == "__main__":
    main()
