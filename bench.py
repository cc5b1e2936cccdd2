"""Benchmark: ProMP meta-iteration throughput on the reference workload.

Workload = the reference's implicit benchmark (BASELINE.md): ProMP on the
2D point-mass corner env with run-script defaults — 40 meta-tasks x 20
rollouts x 100 steps x 2 sampling rounds = 160,000 env steps per
meta-iteration (pro-mp_run_point_mass.py:103-126), including the full
learning step (inner adaptation + 5 PPO epochs with second-order grads).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md); its
multiprocess CPU sampler is bounded by per-step sess.run + pipe pickling
(SURVEY.md §3.2). We use 15,000 env-steps/s as a generous single-host
estimate for the reference (c4.xlarge-class target, run_sweep.py:14) —
the BASELINE.json north star asks for >=10x that.
"""
from __future__ import annotations

import argparse
import json
import time

REFERENCE_ENV_STEPS_PER_S = 15_000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", choices=["scan", "pallas"], default="scan",
                    help="rollout backend: the general scan engine "
                         "(default) or the Pallas VMEM megakernel fast "
                         "path (ops/pallas_rollout.py)")
    ap.add_argument("--mode", choices=["fused", "default"], default="fused",
                    help="fused = async dispatch, one sync at the end "
                         "(throughput mode); default = the trainer's "
                         "phase-split path with amortized Time-* timing "
                         "(timing_every=10), i.e. what run_scripts use")
    ap.add_argument("--workload", choices=["pointmass", "cheetah"],
                    default="pointmass",
                    help="pointmass = the reference's default benchmark "
                         "config; cheetah = the same meta-iteration on "
                         "HalfCheetahRandVel (rigid-body engine in the "
                         "rollout scan)")
    args = ap.parse_args()
    import jax
    # persistent compilation cache: first-ever run pays the (remote) XLA
    # compile; subsequent driver runs start hot
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from promp_tpu.algos.promp import ProMP
    from promp_tpu.envs import MetaPointEnvCorner, normalize
    from promp_tpu.policies.gaussian_mlp import GaussianMLPPolicy
    from promp_tpu.sampling.processor import SampleProcessor
    from promp_tpu.trainer import Trainer

    meta_batch_size, rollouts, horizon = 40, 20, 100
    if args.workload == "cheetah":
        from promp_tpu.envs import make_env
        env = normalize(make_env("HalfCheetahRandVelEnv"))
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
        meta_batch_size=meta_batch_size,
        rollouts_per_meta_task=rollouts,
        max_path_length=horizon, n_itr=1, seed=1,
        rollout_backend=args.backend)

    steps_per_iter = meta_batch_size * rollouts * horizon * 2

    rng = jax.random.PRNGKey(0)

    if args.mode == "default":
        # the run_scripts path: phase-split iteration, amortized timing
        # (one precisely-measured iteration in ten, single end sync else)
        trainer.timing_every = 10
        rng, k = jax.random.split(rng)
        trainer._run_phases(k, measure=True)            # warmup + compile
        n_timed = 10 if args.workload == "pointmass" else 4
        t0 = time.perf_counter()
        for i in range(n_timed):
            rng, k = jax.random.split(rng)
            trainer._run_phases(k, measure=(i % trainer.timing_every == 0))
        # force real completion: pull bytes to the host — through the
        # remote-TPU tunnel, block_until_ready can return once the op is
        # enqueued remotely, which under-reports by orders of magnitude
        jax.device_get(jax.tree.leaves(trainer.train_state)[0])
        elapsed = time.perf_counter() - t0
        steps_per_s = steps_per_iter * n_timed / elapsed
        print(json.dumps({
            "metric": (f"env_steps_per_s_promp_{args.workload}"
                       "_full_meta_iteration_default_mode"),
            "value": round(steps_per_s, 1),
            "unit": "env-steps/s/chip",
            "vs_baseline": round(steps_per_s / REFERENCE_ENV_STEPS_PER_S,
                                 2),
        }))
        return

    def run_iter(train_state, opt_state, key):
        """One full meta-iteration from the trainer's jitted phases,
        dispatched asynchronously (no host syncs inside the loop)."""
        keys = jax.random.split(key, trainer.num_inner_grad_steps + 2)
        tasks = trainer._update_tasks(keys[0])
        task_params = trainer.policy.replicate(train_state["params"],
                                               meta_batch_size)
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

    # warmup / compile (phase-split programs each compile in seconds; the
    # first device op may additionally wait on the TPU tunnel claim grant,
    # which is why warmup is untimed)
    ts, os_ = trainer.train_state, trainer.opt_state
    for i in range(2):
        rng, k = jax.random.split(rng)
        ts, os_, metrics = run_iter(ts, os_, k)
    jax.device_get(jax.tree.leaves(ts)[0])

    n_timed = 10 if args.workload == "pointmass" else 4
    t0 = time.perf_counter()
    for i in range(n_timed):
        rng, k = jax.random.split(rng)
        ts, os_, metrics = run_iter(ts, os_, k)
    # device_get, not block_until_ready: see the default-mode comment —
    # the remote tunnel's ready signal does not imply execution finished
    jax.device_get(jax.tree.leaves(ts)[0])
    elapsed = time.perf_counter() - t0

    steps_per_s = steps_per_iter * n_timed / elapsed
    suffix = "_pallas" if args.backend == "pallas" else ""
    print(json.dumps({
        "metric": (f"env_steps_per_s_promp_{args.workload}"
                   f"_full_meta_iteration{suffix}"),
        "value": round(steps_per_s, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(steps_per_s / REFERENCE_ENV_STEPS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
