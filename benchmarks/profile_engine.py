"""Per-component substep timing for the generic engine path (ant/humanoid).

Round-5 diagnostic for the 3-D fast-path work (VERDICT r4 item 1): times
the full substep and its pieces (fk+mass, rnea, contacts, solve) batched
over the reference-config env width (40 tasks x 20 envs = 800), on
whatever backend is active.

Run: python benchmarks/profile_engine.py [--model ant|humanoid] [--batch 800]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from promp_tpu.envs.mujoco.engine import Engine
from promp_tpu.envs.mujoco.model import get_model


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ant")
    ap.add_argument("--batch", type=int, default=800)
    ap.add_argument("--substeps", type=int, default=10)
    args = ap.parse_args()

    m = get_model(args.model)
    eng = Engine(m, n_substeps=2)
    B = args.batch
    print(f"model={args.model} nv={m.nv} nb={m.nb} nc={len(m.con_body)} "
          f"batch={B}")

    key = jax.random.PRNGKey(0)
    q = jnp.tile(jnp.asarray(m.init_qpos, jnp.float32), (B, 1))
    q = q + 0.01 * jax.random.normal(key, q.shape)
    qd = 0.1 * jax.random.normal(key, q.shape)
    tau = 0.5 * jax.random.normal(key, (B, m.nv))
    h = jnp.float32(m.timestep / 2)

    S = args.substeps

    def many(fn):
        """Chain S substep-ish calls so per-dispatch overhead amortizes."""
        def run(q, qd):
            def body(c, _):
                q, qd = c
                q2, qd2 = fn(q, qd)
                return (q2, qd2), None
            (q, qd), _ = jax.lax.scan(body, (q, qd), None, length=S)
            return q, qd
        return jax.jit(run)

    sub = many(jax.vmap(lambda q, qd: eng.substep(q, qd, tau[0], h)))
    t_sub = timeit(sub, q, qd) / S
    print(f"full substep           : {t_sub*1e6:9.1f} us  "
          f"(-> {B*S/ (t_sub*S) /1e3:.0f}k substeps/s)")

    # pieces (each wrapped in the same scan to amortize dispatch; outputs
    # fed back through dummy combinations to prevent DCE)
    def fk_mass(q, qd):
        kin = eng.fk(q[0]) if False else None
        def one(qq):
            kin = eng.fk(qq)
            M = eng._mass_from_kin(kin)
            return M
        M = jax.vmap(one)(q)
        return q + M[:, 0, : q.shape[1]] * 1e-12, qd

    def rnea(q, qd):
        tau_b = jax.vmap(lambda a, b: eng.rnea_bias(a, b))(q, qd)
        return q + tau_b * 1e-12, qd

    def contacts(q, qd):
        def one(qq, qdd):
            t, f, J, cn, ct, kn = eng._contact_terms(qq, qdd)
            return t
        t = jax.vmap(one)(q, qd)
        return q + t * 1e-12, qd

    def solve_only(q, qd):
        def one(qq, qdd):
            A = eng.mass_matrix(qq) + 0.01 * jnp.eye(m.nv, dtype=jnp.float32)
            if m.nv <= 16:
                from promp_tpu.ops.smallsolve import chol_solve_unrolled
                return chol_solve_unrolled(A, qdd)
            chol = jnp.linalg.cholesky(A)
            return jax.scipy.linalg.cho_solve((chol, True), qdd)
        x = jax.vmap(one)(q, qd)
        return q + x * 1e-12, qd

    for name, fn in [("fk+mass", fk_mass), ("rnea", rnea),
                     ("contacts", contacts), ("fk+mass+solve", solve_only)]:
        t = timeit(many(fn), q, qd) / S
        print(f"{name:22s} : {t*1e6:9.1f} us")


if __name__ == "__main__":
    main()
