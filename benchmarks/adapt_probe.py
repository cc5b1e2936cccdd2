"""Offline adaptation probe: quantify per-task adaptation from a snapshot.

Given a run directory (params.json + itr_*.pkl snapshot from
snapshot_mode="last"), rebuild the training stack, run ONE pre-update
sampling round, take the inner step, run the post-update round, and
report the numbers the aggregate curves hide:

  * per-task pre/post returns and the mean adaptation gap;
  * fraction of tasks where post > pre (per-task, not per-iteration);
  * for scalar-task envs (goal velocity / direction): the correlation
    between the task parameter and the policy's achieved behavior
    (mean forward_vel from env_infos) before and after adaptation — THE
    direct measurement of "did the inner step specialize the policy".

Run:  python benchmarks/adapt_probe.py benchmarks/diag/walker_adapt
"""
from __future__ import annotations

import glob
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main(run_dir, seed=123):
    import jax

    # see probe_task.py: force CPU so the probe never queues on the
    # exclusive remote-TPU chip claim behind a training run
    jax.config.update("jax_platforms",
                      os.environ.get("PROMP_PROBE_PLATFORM", "cpu"))

    from promp_tpu.run import build, enable_compilation_cache

    enable_compilation_cache()
    with open(os.path.join(run_dir, "params.json")) as f:
        config = json.load(f)
    config = dict(config, n_itr=1, snapshot_mode="none")
    trainer = build(config)
    snaps = sorted(glob.glob(os.path.join(run_dir, "itr_*.pkl")))
    # snapshot_mode "last"/"last_gap" writes params.pkl instead
    snaps += glob.glob(os.path.join(run_dir, "params.pkl"))
    if snaps:
        with open(snaps[-1], "rb") as f:
            trainer.restore(pickle.load(f))
        tag = os.path.basename(snaps[-1])
    else:
        tag = "fresh init"

    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, 3)
    tasks = trainer._update_tasks(keys[0])
    ts = trainer.train_state
    task_params = trainer.policy.replicate(ts["params"],
                                           trainer.meta_batch_size)
    pre = trainer._sample_round(task_params, tasks, keys[1], True)
    pre.pop("stats")
    adapted = trainer._adapt(task_params, ts["step_sizes"], pre)
    post = trainer._sample_round(adapted, tasks, keys[2], False)
    post.pop("stats")
    pre, post, tasks = jax.device_get((pre, post, tasks))

    def per_task_return(s):
        # undiscounted return per task: total reward / number of
        # trajectory segments (auto-reset restarts count separately;
        # segment starts are timesteps == 0)
        rew = np.asarray(s["rewards"])               # (tasks, envs, T)
        starts = (np.asarray(s["timesteps"]) == 0).sum((-1, -2))
        return rew.sum((-1, -2)) / np.maximum(starts, 1)

    r_pre = per_task_return(pre)
    r_post = per_task_return(post)
    gap = r_post - r_pre
    print(f"{run_dir} [{tag}] env={config['env']} "
          f"algo={config.get('algo', 'ProMP')}")
    print(f"  per-task return: pre={r_pre.mean():.2f} "
          f"post={r_post.mean():.2f} gap={gap.mean():.2f} "
          f"(+-{gap.std():.2f}), post>pre on "
          f"{(gap > 0).mean() * 100:.0f}% of tasks")

    if isinstance(tasks, dict):
        # rand-params family: tasks are physics-multiplier pytrees
        # (reference envs/base.py:69-108). Two questions the curves hide:
        # (a) does adaptation help more where the physics are more
        # extreme, and (b) does the inner step steer the POLICY by the
        # physics — i.e. do similar physics produce similar adapted
        # parameters?
        feats = [np.log(np.asarray(v)).reshape(len(gap), -1)
                 for _k, v in sorted(tasks.items())]
        logm = np.concatenate(feats, axis=1)              # (tasks, D)
        extremity = np.linalg.norm(logm, axis=1)

        def corr(a, b):
            return float(np.corrcoef(a, b)[0, 1])

        hard = extremity > np.median(extremity)
        print(f"  physics extremity ||log m||: corr(gap)="
              f"{corr(extremity, gap):+.3f} corr(pre)="
              f"{corr(extremity, r_pre):+.3f} corr(post)="
              f"{corr(extremity, r_post):+.3f}")
        print(f"  gap on extreme-physics half: {gap[hard].mean():+.2f} "
              f"vs mild half: {gap[~hard].mean():+.2f}")

        # (b): pairwise task similarity vs pairwise adapted-params
        # similarity (upper triangles)
        base_flat = np.concatenate(
            [np.asarray(leaf).reshape(len(gap), -1)
             for leaf in jax.tree.leaves(jax.device_get(task_params))], 1)
        adap_flat = np.concatenate(
            [np.asarray(leaf).reshape(len(gap), -1)
             for leaf in jax.tree.leaves(jax.device_get(adapted))], 1)
        delta = adap_flat - base_flat                     # (tasks, P)
        dn = delta / (np.linalg.norm(delta, axis=1, keepdims=True) + 1e-12)
        tn = logm / (np.linalg.norm(logm, axis=1, keepdims=True) + 1e-12)
        iu = np.triu_indices(len(gap), k=1)
        sim_theta = (dn @ dn.T)[iu]
        sim_task = (tn @ tn.T)[iu]
        print(f"  corr(pairwise task sim, pairwise inner-step-direction "
              f"sim) = {corr(sim_task, sim_theta):+.3f} over "
              f"{len(sim_task)} pairs")

    t = np.asarray(tasks) if not isinstance(tasks, dict) else np.zeros(0)
    if t.ndim == 1 and t.size and "forward_vel" in pre.get("env_infos", {}):
        def vel_corr(s):
            v = np.asarray(s["env_infos"]["forward_vel"])
            vbar = v.mean((-1, -2))                  # per-task mean vel
            return np.corrcoef(t, vbar)[0, 1], vbar
        c_pre, v_pre = vel_corr(pre)
        c_post, v_post = vel_corr(post)
        print(f"  corr(task, mean forward_vel): pre={c_pre:+.3f} "
              f"post={c_post:+.3f}  (adaptation = post >> pre)")
        print(f"  mean |forward_vel|: pre={np.abs(v_pre).mean():.2f} "
              f"post={np.abs(v_post).mean():.2f}; task range "
              f"[{t.min():.2f}, {t.max():.2f}]")


if __name__ == "__main__":
    main(sys.argv[1])
