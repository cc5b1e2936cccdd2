"""Full env-step cost breakdown for the 3-D bodies (ant/humanoid).

The substep profiler (profile_engine.py) covers the physics inner loop;
this one measures everything AROUND it at the realized env-step level:

  * substeps-only ceiling: frame_skip x n_substeps chained substeps
  * full vmapped env.step (physics + obs assembly + reward + done)
  * isolated pieces: _obs, contact_wrench, fk, body_velocities

to localize the gap between the physics-only ceiling (RESULTS r5: ant
~246k env-steps/s, humanoid ~110k) and the full-training numbers (151k /
57.8k). In particular, _step_common and _obs both call contact_wrench on
the same (q, qd) — this prints whether XLA's CSE already dedupes that or
whether an explicit share is worth it.

Run: python benchmarks/profile_step.py [--env HumanoidRandDirecEnv] [--batch 800]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from promp_tpu.envs.base import make_env


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])  # full sync (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="HumanoidRandDirecEnv")
    ap.add_argument("--batch", type=int, default=800)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    env = make_env(args.env)
    m, eng = env.model, env.engine
    B, S = args.batch, args.steps
    key = jax.random.PRNGKey(0)
    tasks = env.sample_tasks(key, B)
    states, _ = jax.jit(jax.vmap(env.reset))(
        jax.random.split(key, B), tasks)
    acts = 0.3 * jax.random.normal(key, (B, len(m.act_dof)))

    def scan_steps(states, tasks, acts):
        def body(c, _):
            s, _o = c
            s2, o, r, d, _i = jax.vmap(env.step, in_axes=(0, 0, 0, None))(
                s, acts, tasks, key)
            return (s2, o), r

        (s2, o), rs = jax.lax.scan(
            body, (states, jnp.zeros((B, env._obs_dim()))), None, length=S)
        return o, rs

    def scan_substeps(states, tasks):
        n_sub = env.frame_skip * env.n_substeps
        h = jnp.float32(m.timestep / env.n_substeps)
        tau = jnp.zeros((m.nv,))
        # same gated fast path the training step uses (engine.step:688)
        sub = eng._planar_substep or eng._spatial_substep or eng.substep

        def body(c, _):
            q, qd = c
            q2, qd2 = jax.vmap(
                lambda q1, qd1, t: sub(q1, qd1, tau, h,
                                       env._mods(t)))(q, qd, tasks)
            return (q2, qd2), ()

        (q, qd), _ = jax.lax.scan(
            body, (states["q"], states["qd"]), None, length=S * n_sub)
        return q, qd

    full = timeit(jax.jit(scan_steps), states, tasks, acts)
    sub = timeit(jax.jit(scan_substeps), states, tasks)
    n_env_steps = B * S
    print(f"env={args.env} batch={B} steps={S} "
          f"(frame_skip={env.frame_skip} n_substeps={env.n_substeps})")
    print(f"full step scan:     {full*1e3:8.2f} ms  "
          f"{n_env_steps/full/1e3:8.1f}k env-steps/s")
    print(f"substeps-only scan: {sub*1e3:8.2f} ms  "
          f"{n_env_steps/sub/1e3:8.1f}k env-steps/s (ceiling)")
    print(f"non-physics overhead: {(full-sub)/full*100:5.1f}% of the step")

    # isolated pieces (per call, batched once — no scan)
    q, qd = states["q"], states["qd"]

    def piece(name, fn):
        t = timeit(jax.jit(fn), n=30)
        print(f"  {name:24s} {t*1e6:8.1f} us/batch-call")

    piece("fk", lambda: jax.vmap(eng.fk)(q)["com"])
    piece("body_velocities", lambda: jax.vmap(eng.body_velocities)(q, qd))
    piece("contact_wrench", lambda: jax.vmap(
        lambda a, b, t: eng.contact_wrench(a, b, env._mods(t)))(
            q, qd, tasks))
    piece("obs", lambda: jax.vmap(env._obs)(states, tasks))
    piece("one cse'd step", lambda: jax.vmap(
        env.step, in_axes=(0, 0, 0, None))(states, acts, tasks, key))


if __name__ == "__main__":
    main()
