"""Batch-width throughput/MFU scaling (VERDICT r3 items 1b + 5).

RESULTS.md §2 asserts the knob that moves MFU on these latency-bound
workloads is batch width (envs-per-task). This script measures it: the
fused ProMP meta-iteration at rollouts_per_meta_task in {20, 100, 200}
(reference default 20, pro-mp_run_point_mass.py:105) for the point-mass
and HalfCheetahRandVel workloads, emitting env-steps/s and MFU per row.

Widening envs-per-task keeps every per-step kernel identical in COUNT but
grows its per-op work (the batch dim of each small matmul/physics op), so
on a latency-bound program throughput should scale near-linearly until
some op finally hits a bandwidth/compute roof.

Run on the TPU host:  python benchmarks/width_scaling.py [--workload both]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: trainer builder + MFU)


def measure(jax, workload, width, n_timed):
    from promp_tpu.algos.promp import ProMP
    from promp_tpu.envs import MetaPointEnvCorner, make_env, normalize
    from promp_tpu.policies.gaussian_mlp import GaussianMLPPolicy
    from promp_tpu.sampling.processor import SampleProcessor
    from promp_tpu.trainer import Trainer

    if workload == "cheetah":
        env = normalize(make_env("HalfCheetahRandVelEnv"))
    elif workload == "ant":
        env = normalize(make_env("AntRandGoalEnv"))
    elif workload == "humanoid":
        env = normalize(make_env("HumanoidRandDirecEnv"))
    else:
        env = normalize(MetaPointEnvCorner())
    policy = GaussianMLPPolicy(obs_dim=env.obs_dim,
                               action_dim=env.action_dim,
                               hidden_sizes=(64, 64))
    algo = ProMP(policy=policy, inner_lr=0.1, num_inner_grad_steps=1,
                 learning_rate=1e-3, num_ppo_steps=5, clip_eps=0.3,
                 init_inner_kl_penalty=5e-4,
                 adaptive_inner_kl_penalty=False)
    trainer = Trainer(
        algo=algo, env=env, policy=policy,
        sample_processor=SampleProcessor(discount=0.99, gae_lambda=1.0,
                                         normalize_adv=True),
        meta_batch_size=40, rollouts_per_meta_task=width,
        max_path_length=100, n_itr=1, seed=1,
        rollout_backend="scan", timing_every=10)
    steps_per_iter = 40 * width * 100 * 2

    def run_iter(train_state, opt_state, key):
        keys = jax.random.split(key, trainer.num_inner_grad_steps + 2)
        tasks = trainer._update_tasks(keys[0])
        task_params = trainer.policy.replicate(train_state["params"],
                                               trainer.meta_batch_size)
        all_data = []
        for step in range(trainer.num_inner_grad_steps + 1):
            samples = trainer._sample_round(task_params, tasks,
                                            keys[step + 1], step == 0)
            samples.pop("stats")
            all_data.append(samples)
            if step < trainer.num_inner_grad_steps:
                task_params = trainer._adapt(
                    task_params, train_state["step_sizes"], samples)
        return trainer._outer(train_state, opt_state, all_data,
                              trainer.hparams)

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
    elapsed = time.perf_counter() - t0
    steps_per_s = steps_per_iter * n_timed / elapsed

    row = {
        "workload": workload,
        "envs_per_task": width,
        "env_steps_per_iteration": steps_per_iter,
        "iteration_s": round(elapsed / n_timed, 4),
        "env_steps_per_s": round(steps_per_s, 1),
    }
    try:
        flops = bench.iteration_flops(jax, trainer)
        kind = jax.devices()[0].device_kind
        peak = bench.PEAK_FLOPS.get(kind)
        row["gflop_per_iteration"] = round(flops / 1e9, 3)
        if peak:
            row["mfu_pct"] = round(
                100.0 * flops / (elapsed / n_timed) / peak, 4)
    except Exception as e:
        row["mfu_note"] = f"cost_analysis unavailable: {e}"
    print(json.dumps(row), flush=True)
    del trainer, ts, os_
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="both",
                    choices=["both", "pointmass", "cheetah", "ant",
                             "humanoid"])
    ap.add_argument("--widths", default="20,100,200")
    args = ap.parse_args()
    import jax
    if os.environ.get("PROMP_BENCH_PLATFORM"):
        jax.config.update("jax_platforms",
                          os.environ["PROMP_BENCH_PLATFORM"])
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    widths = [int(w) for w in args.widths.split(",")]
    workloads = (["pointmass", "cheetah"] if args.workload == "both"
                 else [args.workload])
    for workload in workloads:
        for width in widths:
            # fewer timed iterations for the slow big-width cheetah rows
            n_timed = 10 if workload == "pointmass" else max(2, 8 // (
                max(1, width // 50)))
            measure(jax, workload, width, n_timed)


if __name__ == "__main__":
    main()
