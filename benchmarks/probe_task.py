"""Task-identifiability probe (VERDICT r2 item 1): can the task parameter
be predicted from PRE-UPDATE rollouts?

The inner adaptation step can only specialize the policy to a task if the
pre-update trajectories carry information about that task — through the
rewards (the likelihood-ratio surrogate's advantages) and, indirectly,
the states visited. This probe makes that quantitative: sample tasks,
roll out the (random-init or snapshot) pre-update policy, build
per-trajectory summary features, and ridge-regress the task parameter
from them. Reported R² (fit on half the tasks, scored on the held-out
half) bounds how much task signal one round of sampling exposes:

  * R² ~ 1: the advantage signal cleanly separates tasks — if adaptation
    is still flat, the failure is optimization, not information;
  * R² ~ 0: the rollouts do not distinguish tasks (e.g. a policy that
    stands still sees identical dynamics under every goal velocity) —
    no inner step can adapt, whatever the hyperparameters.

Run:  python benchmarks/probe_task.py Walker2DRandVelEnv [snapshot.pkl]
      JAX_PLATFORMS=cpu works (slow engine but fine at probe scale).
"""
from __future__ import annotations

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

# sitecustomize may pin a remote-TPU platform that overrides JAX_PLATFORMS
# and serializes on the exclusive chip claim; probes are cheap enough for
# CPU, so force it (set PROMP_PROBE_PLATFORM=tpu to opt out).
jax.config.update("jax_platforms",
                  os.environ.get("PROMP_PROBE_PLATFORM", "cpu"))

import jax.numpy as jnp
import numpy as np


def features(samples):
    """Per-(task, rollout) summary features from a rollout batch."""
    obs = samples["observations"]          # (tasks, envs, T, d)
    rew = samples["rewards"]               # (tasks, envs, T)
    acts = samples["actions"]
    feats = [
        obs.mean(axis=2), obs.std(axis=2),
        obs[..., -1, :],                                  # final state
        rew.mean(axis=2, keepdims=True),
        rew.max(axis=2, keepdims=True),
        rew.min(axis=2, keepdims=True),
        np.abs(acts).mean(axis=2),
    ]
    return np.concatenate([np.asarray(f) for f in feats], axis=-1)


def probe(env_name, snapshot=None, n_tasks=64, rollouts=20, horizon=100,
          seed=0):
    from promp_tpu.envs import make_env, normalize
    from promp_tpu.policies.gaussian_mlp import GaussianMLPPolicy
    from promp_tpu.sampling.rollout import rollout

    env = normalize(make_env(env_name))
    policy = GaussianMLPPolicy(obs_dim=env.obs_dim,
                               action_dim=env.action_dim,
                               hidden_sizes=(64, 64))
    key = jax.random.PRNGKey(seed)
    k_init, k_task, k_roll = jax.random.split(key, 3)
    if snapshot:
        with open(snapshot, "rb") as f:
            snap = pickle.load(f)
        params = snap["train_state"]["params"]
    else:
        params = policy.init(k_init)
    task_params = policy.replicate(params, n_tasks)
    tasks = env.sample_tasks(k_task, n_tasks)

    samples = jax.jit(
        lambda tp, t, k: rollout(env, policy, tp, t, k, rollouts, horizon,
                                 floor_std=True))(task_params, tasks, k_roll)
    X = features(jax.device_get(samples))             # (tasks, envs, F)
    y = np.asarray(jax.device_get(tasks), np.float64)
    if y.ndim == 1:
        y = y[:, None]
    n_t, n_e, n_f = X.shape
    Xf = X.reshape(n_t * n_e, n_f).astype(np.float64)
    yf = np.repeat(y, n_e, axis=0)

    # split by TASK so the probe must generalize across tasks
    rs = np.random.RandomState(0)
    order = rs.permutation(n_t)
    tr_t, te_t = order[: n_t // 2], order[n_t // 2:]
    tr = np.isin(np.repeat(np.arange(n_t), n_e), tr_t)
    mu, sd = Xf[tr].mean(0), Xf[tr].std(0) + 1e-8
    Z = (Xf - mu) / sd
    lam = 1e-3 * len(tr_t) * n_e
    A = Z[tr].T @ Z[tr] + lam * np.eye(n_f)
    W = np.linalg.solve(A, Z[tr].T @ (yf[tr] - yf[tr].mean(0)))
    pred = Z @ W + yf[tr].mean(0)

    out = {}
    for name, m in (("train", tr), ("holdout", ~tr)):
        resid = ((yf[m] - pred[m]) ** 2).sum()
        total = ((yf[m] - yf[m].mean(0)) ** 2).sum()
        out[name] = 1.0 - resid / total
    return out


if __name__ == "__main__":
    env_name = sys.argv[1] if len(sys.argv) > 1 else "Walker2DRandVelEnv"
    snap = sys.argv[2] if len(sys.argv) > 2 else None
    r2 = probe(env_name, snap)
    tag = os.path.basename(snap) if snap else "random-init policy"
    print(f"{env_name} ({tag}): task-probe R² "
          f"train={r2['train']:.3f} holdout={r2['holdout']:.3f}")
