"""Subprocess worker for the multi-process distributed tests (SURVEY.md §2.9 P5).

Each process: `jax.distributed.initialize` against a localhost coordinator
(the TPU-world analog of the reference's MPI rank awareness,
reference utils/logger.py:411-427), build the task-axis mesh over the
GLOBAL device set, run ONE fused ProMP meta-iteration, and dump the
metrics + a logger KV round (to exercise the per-process `-rankNNN` file
suffix) to --out as JSON.

With --num-processes 1 it runs the identical program single-process on a
2-virtual-device mesh (xla_force_host_platform_device_count=2), producing
the comparison result: the partitioned computation is the same SPMD
program either way, so the losses must agree.
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", type=int, default=9911)
    ap.add_argument("--mesh-size", type=int, default=2)
    ap.add_argument("--out", required=True)
    ap.add_argument("--logdir", required=True)
    args = ap.parse_args()

    if args.num_processes == 1:
        # single-process comparison run: mesh-size virtual devices
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.mesh_size}"
            ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)

    from promp_tpu.parallel.mesh import init_distributed, make_mesh

    init_distributed(coordinator_address=f"localhost:{args.port}",
                     num_processes=args.num_processes,
                     process_id=args.process_id)
    assert jax.device_count() == args.mesh_size, jax.device_count()

    import numpy as np

    from promp_tpu.algos.promp import ProMP
    from promp_tpu.envs import MetaPointEnvCorner, normalize
    from promp_tpu.policies.gaussian_mlp import GaussianMLPPolicy
    from promp_tpu.sampling.processor import SampleProcessor
    from promp_tpu.trainer import Trainer
    from promp_tpu.utils import logger

    mesh = make_mesh(args.mesh_size)
    env = normalize(MetaPointEnvCorner(reward_type="dense"))
    policy = GaussianMLPPolicy(obs_dim=env.obs_dim,
                               action_dim=env.action_dim,
                               hidden_sizes=(16, 16))
    algo = ProMP(policy=policy, num_inner_grad_steps=1, num_ppo_steps=2,
                 adaptive_inner_kl_penalty=False)
    trainer = Trainer(
        algo=algo, env=env, policy=policy,
        sample_processor=SampleProcessor(normalize_adv=True),
        meta_batch_size=2 * args.mesh_size, rollouts_per_meta_task=2,
        max_path_length=5, n_itr=1, seed=0, fused=True, mesh=mesh)

    rng = jax.random.PRNGKey(0)
    train_state, _opt_state, metrics = trainer._iteration(
        trainer.train_state, trainer.opt_state, trainer.hparams, rng)
    jax.block_until_ready(train_state)

    # exercise the per-process log-file suffixing (-rankNNN on multi-host)
    logger.configure(dir=args.logdir, format_strs=["csv"])
    logger.logkv("Itr", 0)
    logger.logkv("LossAfter", float(np.asarray(metrics["LossAfter"])))
    logger.dumpkvs()

    result = {
        "process_id": args.process_id,
        "num_processes": args.num_processes,
        "process_count_seen": jax.process_count(),
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
        "LossBefore": float(np.asarray(metrics["LossBefore"])),
        "LossAfter": float(np.asarray(metrics["LossAfter"])),
        "params_sum": float(sum(
            np.abs(np.asarray(leaf)).sum()
            for leaf in jax.tree.leaves(train_state["params"]))),
    }
    with open(args.out, "w") as f:
        json.dump(result, f)
    print("worker done:", json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
