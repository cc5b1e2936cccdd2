"""Weak-scaling measurement on a virtual CPU device mesh (VERDICT r2
item 7): fused ProMP meta-iteration wall-clock at 1/2/4/8 devices with the
task axis sharded over the mesh and per-device load held constant.

This turns "sharding is bitwise-correct" (tests/test_sampling.py
TestShardedEquivalence) into "sharding actually parallelizes": with
TASKS_PER_DEVICE meta-tasks per device, perfect weak scaling keeps the
iteration time flat as devices (and total tasks) grow; the efficiency
column is t(1)/t(n).

Virtual CPU devices share host cores, so the numbers UNDERSTATE real
multi-chip efficiency (8 virtual devices contend for the same CPUs; on a
TPU slice each shard owns a chip and the only cross-device traffic is the
outer step's psum over ICI). The point of the measurement is that the
sharded program's critical path per device stays flat — i.e. XLA really
partitions the (task, env, time) rollout and the learner reductions.

Run:  python benchmarks/weak_scaling.py          # prints a markdown table
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TASKS_PER_DEVICE = 5
ROLLOUTS = 20
HORIZON = 100
N_ITERS = 5
# --fixed mode: keep the TOTAL load constant (the reference default's 40
# tasks) while the device count grows. On an oversubscribed host (more
# virtual devices than cores) wall-clock cannot drop, so equal times
# across n directly measure the partitioning overhead XLA adds — the
# complement of the weak-scaling table.
FIXED_TASKS = 40


def child(n_devices: int, fixed: bool = False):
    import jax
    # the host may pin a remote-TPU platform via sitecustomize, which
    # overrides the JAX_PLATFORMS env var — merely importing jax would
    # then queue on the exclusive chip claim. Force the CPU backend the
    # way tests/conftest.py does.
    jax.config.update("jax_platforms", "cpu")

    from promp_tpu.algos.promp import ProMP
    from promp_tpu.envs import MetaPointEnvCorner, normalize
    from promp_tpu.parallel.mesh import make_mesh
    from promp_tpu.policies.gaussian_mlp import GaussianMLPPolicy
    from promp_tpu.sampling.processor import SampleProcessor
    from promp_tpu.trainer import Trainer

    meta_batch_size = FIXED_TASKS if fixed else TASKS_PER_DEVICE * n_devices
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
        rollouts_per_meta_task=ROLLOUTS,
        max_path_length=HORIZON, n_itr=1, seed=1,
        mesh=make_mesh(n_devices))

    rng = jax.random.PRNGKey(0)
    ts, os_, hp = trainer.train_state, trainer.opt_state, trainer.hparams
    for _ in range(2):  # warmup + compile
        rng, k = jax.random.split(rng)
        ts, os_, _m = trainer._iteration(ts, os_, hp, k)
    jax.block_until_ready(ts)

    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        rng, k = jax.random.split(rng)
        ts, os_, _m = trainer._iteration(ts, os_, hp, k)
    jax.block_until_ready(ts)
    elapsed = (time.perf_counter() - t0) / N_ITERS
    steps = meta_batch_size * ROLLOUTS * HORIZON * 2
    print(json.dumps({"n_devices": n_devices, "tasks": meta_batch_size,
                      "iter_s": elapsed, "steps_per_s": steps / elapsed}))


def main(fixed: bool):
    rows = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_force_host_platform_device_count={n}"
                            ).strip()
        cmd = [sys.executable, __file__, "--child", str(n)]
        if fixed:
            cmd.append("--fixed")
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=1800)
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print(out.stdout, out.stderr, file=sys.stderr)
            raise RuntimeError(f"child n={n} produced no result")
        rows.append(json.loads(lines[-1]))
        print(f"# n={n} done: {rows[-1]['iter_s']*1e3:.1f} ms/iter",
              file=sys.stderr)

    t1 = rows[0]["iter_s"]
    kind = ("partitioning overhead (fixed 40-task load)" if fixed
            else "weak-scaling efficiency")
    print(f"| devices | tasks | iter time (ms) | env-steps/s | {kind} |")
    print("|---|---|---|---|---|")
    for r in rows:
        eff = t1 / r["iter_s"]
        cell = (f"{(r['iter_s'] / t1 - 1) * 100:+.0f}%" if fixed
                else f"{eff * 100:.0f}%")
        print(f"| {r['n_devices']} | {r['tasks']} "
              f"| {r['iter_s']*1e3:.1f} | {r['steps_per_s']:,.0f} "
              f"| {cell} |")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), fixed="--fixed" in sys.argv)
    else:
        main(fixed="--fixed" in sys.argv)
