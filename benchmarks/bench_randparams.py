"""Rand-params meta-iteration throughput: mods megakernel on vs off.

The round-5 continuation taught the Pallas substep megakernel to take
the rand-params multipliers (body_mass / body_inertia / dof_damping /
friction, rand_params.py:32) as packed per-lane kernel inputs
(ops/pallas_substep.py make_vmappable_chain_mods), so the rand-params
family — previously pinned to the planar XLA fast path — can run its
whole frame_skip x n_substeps physics chain VMEM-resident too.

This measures the same implicit reference workload bench.py uses
(ProMP run-script defaults: 40 tasks x 20 rollouts x 100 steps x 2
rounds = 160k env steps per meta-iteration, pro-mp_run_mujoco.py
defaults) on HopperRandParamsEnv / Walker2DRandParamsEnv, with the
kernel gated on and off, and cross-checks one full env step's outputs
between the two paths on the real device.

Run (TPU): python benchmarks/bench_randparams.py [--envs Hopper,Walker]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_trainer(env_name, use_kernel):
    import jax
    from promp_tpu.algos.promp import ProMP
    from promp_tpu.envs import make_env, normalize
    from promp_tpu.policies.gaussian_mlp import GaussianMLPPolicy
    from promp_tpu.sampling.processor import SampleProcessor
    from promp_tpu.trainer import Trainer

    env = normalize(make_env(env_name))
    # Engine is a frozen dataclass; flip the gate through object.__setattr__
    # (same mechanism its own caches use) before anything traces.
    eng = env.env.engine
    object.__setattr__(eng, "use_pallas_substep", use_kernel)
    policy = GaussianMLPPolicy(obs_dim=env.obs_dim,
                               action_dim=env.action_dim,
                               hidden_sizes=(64, 64))
    algo = ProMP(policy=policy, inner_lr=0.1, num_inner_grad_steps=1,
                 learning_rate=1e-3, num_ppo_steps=5, clip_eps=0.3,
                 init_inner_kl_penalty=5e-4,
                 adaptive_inner_kl_penalty=False)
    return Trainer(
        algo=algo, env=env, policy=policy,
        sample_processor=SampleProcessor(discount=0.99, gae_lambda=1.0,
                                         normalize_adv=True),
        meta_batch_size=40, rollouts_per_meta_task=20,
        max_path_length=100, n_itr=1, seed=1,
        rollout_backend="scan", timing_every=10), env


def time_fused(trainer, n_timed=4):
    import jax

    def run_iter(ts, os_, key):
        keys = jax.random.split(key, trainer.num_inner_grad_steps + 2)
        tasks = trainer._update_tasks(keys[0])
        task_params = trainer.policy.replicate(ts["params"],
                                               trainer.meta_batch_size)
        all_data = []
        for step in range(trainer.num_inner_grad_steps + 1):
            samples = trainer._sample_round(task_params, tasks,
                                            keys[step + 1], step == 0)
            samples.pop("stats")
            all_data.append(samples)
            if step < trainer.num_inner_grad_steps:
                task_params = trainer._adapt(
                    task_params, ts["step_sizes"], samples)
        return trainer._outer(ts, os_, all_data, trainer.hparams)

    rng = jax.random.PRNGKey(0)
    ts, os_ = trainer.train_state, trainer.opt_state
    for _ in range(2):
        rng, k = jax.random.split(rng)
        ts, os_, _m = run_iter(ts, os_, k)
    jax.device_get(jax.tree.leaves(ts)[0])
    t0 = time.perf_counter()
    for _ in range(n_timed):
        rng, k = jax.random.split(rng)
        ts, os_, _m = run_iter(ts, os_, k)
    jax.device_get(jax.tree.leaves(ts)[0])
    return 160_000 * n_timed / (time.perf_counter() - t0)


def parity_check(env_name):
    """One full env.step through kernel vs fallback on the live backend."""
    import jax
    import jax.numpy as jnp
    from promp_tpu.envs import make_env
    from promp_tpu.envs.mujoco.rand_params import sample_param_multipliers

    env = make_env(env_name)
    eng = env.engine
    m = eng.model
    B = 64
    key = jax.random.PRNGKey(11)
    kq, kd, kc, km = jax.random.split(key, 4)
    q = 0.1 * jax.random.normal(kq, (B, m.nv))
    q = q.at[:, 1].add(1.25)
    qd = 0.5 * jax.random.normal(kd, (B, m.nv))
    ctrl = 0.5 * jax.random.normal(kc, (B, m.nu))
    mods = sample_param_multipliers(km, m, B, 3.0)

    def stepped(use_kernel):
        object.__setattr__(eng, "use_pallas_substep", use_kernel)
        object.__setattr__(eng, "_pallas_chain_cache", {})
        f = jax.jit(jax.vmap(
            lambda a, b, c, md: eng.step(a, b, c, env.frame_skip,
                                         mods=md)))
        out = f(q, qd, ctrl, mods)
        return jax.tree.map(np.asarray, out)

    (qk, qdk), (qr, qdr) = stepped(True), stepped(False)
    object.__setattr__(eng, "use_pallas_substep", True)
    dq = float(np.max(np.abs(qk - qr)))
    dqd = float(np.max(np.abs(qdk - qdr)))
    return dq, dqd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", default="Hopper,Walker")
    ap.add_argument("--n-timed", type=int, default=4)
    args = ap.parse_args()
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    names = {"Hopper": "HopperRandParamsEnv",
             "Walker": "Walker2DRandParamsEnv",
             "Cheetah": "HalfCheetahRandParamsEnv"}
    for short in args.envs.split(","):
        env_name = names[short]
        dq, dqd = parity_check(env_name)
        print(json.dumps({"env": env_name, "parity_max_dq": dq,
                          "parity_max_dqd": dqd}), flush=True)
        out = {"env": env_name}
        for label, use_kernel in [("fallback", False), ("kernel", True)]:
            trainer, _env = build_trainer(env_name, use_kernel)
            sps = time_fused(trainer, args.n_timed)
            out[f"env_steps_per_s_{label}"] = round(sps, 1)
        out["speedup"] = round(out["env_steps_per_s_kernel"]
                               / out["env_steps_per_s_fallback"], 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
