"""Meta-training orchestration loop.

TPU-native analog of the reference Trainer (reference:
meta_policy_search/meta_trainer.py:59-152). Per iteration it mirrors the
reference loop — sample tasks, (num_inner_grad_steps+1) rounds of
{sample, process, adapt}, then the meta-optimization — but each phase is a
single jitted on-device computation over the full (task x env x time)
batch, and only the per-iteration metrics are pulled to the host.

Two execution modes:
  * phase-split (default): rounds and the outer step are separate jitted
    calls, giving the reference's ``Time-Sampling`` / ``Time-InnerStep`` /
    ``Time-OuterStep`` phase timings (meta_trainer.py:131-142).
  * fused: the ENTIRE iteration (task sampling -> rollouts -> adaptation ->
    outer optimization) is one jitted function — maximum throughput, used
    by the benchmark harness.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from promp_tpu.sampling.rollout import rollout
from promp_tpu.utils import logger


@dataclass
class Trainer:
    """Args mirror meta_trainer.py:34-57 (+ the on-device engine knobs)."""

    algo: Any
    env: Any
    policy: Any
    sample_processor: Any
    meta_batch_size: int = 40
    rollouts_per_meta_task: int = 20
    max_path_length: int = 100
    n_itr: int = 1001
    seed: int = 1
    start_itr: int = 0
    fused: bool = False
    mesh: Optional[Any] = None  # jax.sharding.Mesh for multi-chip runs
    task_axis: str = "task"
    # Rollout backend: "scan" is the general engine (sampling/rollout.py);
    # "pallas" opts into the VMEM-resident megakernel for the point-mass
    # benchmark workload (ops/pallas_rollout.py, bitwise-validated vs a
    # plain-JAX replay in tests/test_pallas.py). Falls back to "scan" with
    # a warning when the env/policy shape doesn't fit the kernel.
    rollout_backend: str = "scan"
    # Phase timing cadence: per-phase wall-clock (Time-Sampling /
    # Time-SampleProc / Time-InnerStep / Time-OuterStep, PolicyExecTime /
    # EnvExecTime) needs host barriers between phases, which cost ~4x
    # throughput if taken every iteration (round-1 RESULTS.md). Every
    # ``timing_every``-th iteration is measured precisely; the other
    # iterations run barrier-free (one sync at iteration end) and carry
    # the last measured values forward. The default 1 is the reference's
    # per-iteration timing exactly (meta_trainer.py:131-142); bench.py and
    # long validation runs opt into amortized timing explicitly.
    timing_every: int = 1
    # jax.profiler trace capture (SURVEY.md §5.1: the reference has only
    # coarse wall-clock keys; we add real device traces): directory to
    # write a trace into, and which iteration to capture.
    profile_dir: Optional[str] = None
    profile_itr: int = 2

    def __post_init__(self):
        self.num_inner_grad_steps = self.algo.num_inner_grad_steps
        self._build()

    def _pallas_supported(self):
        """The megakernel covers exactly the benchmark workload: sparse
        MetaPointEnvCorner under normalize(scale=10, no obs/reward
        normalization) with a 2-hidden-layer tanh MLP."""
        from promp_tpu.utils import logger
        env = self.env
        inner = getattr(env, "env", env)
        ok = (type(inner).__name__ == "MetaPointEnvCorner"
              and getattr(inner, "reward_type", None) == "sparse"
              and getattr(env, "normalization_scale", None) == 10.0
              and not getattr(env, "normalize_obs", False)
              and not getattr(env, "normalize_reward", False)
              and len(self.policy.hidden_sizes) == 2
              and self.policy.hidden_nonlinearity == "tanh"
              and self.policy.output_nonlinearity is None)
        if not ok:
            logger.log("rollout_backend='pallas' unsupported for this "
                       "env/policy; falling back to the scan engine")
        return ok

    # ------------------------------------------------------------------ build
    def _build(self):
        key = jax.random.PRNGKey(self.seed)
        self._rng, init_key = jax.random.split(key)
        params = self.policy.init(init_key)
        step_sizes = self.algo.init_step_sizes(params)
        self.train_state = {"params": params, "step_sizes": step_sizes}
        self.opt_state = self.algo.init_opt_state(self.train_state)
        self.hparams = self.algo.init_hparams()
        self.total_timesteps_sampled = 0

        shard = None
        if self.mesh is not None:
            from promp_tpu.parallel.mesh import task_sharding
            shard = task_sharding(self.mesh, self.task_axis)

        def constrain(tree):
            # Shard the leading (task,) axis over the mesh; XLA then keeps
            # rollouts/processing task-parallel and inserts psums for the
            # outer-step reductions (SURVEY.md §5.8).
            if shard is None:
                return tree
            return jax.lax.with_sharding_constraint(tree, shard)

        def update_tasks(rng):
            return constrain(
                self.env.sample_tasks(rng, self.meta_batch_size))

        use_pallas = (self.rollout_backend == "pallas"
                      and self._pallas_supported())

        def pallas_rollout(task_params, tasks, rng):
            from promp_tpu.ops.pallas_rollout import pallas_pointmass_rollout
            n_tasks, n_envs = self.meta_batch_size, self.rollouts_per_meta_task
            horizon = self.max_path_length
            k_reset, k_noise = jax.random.split(rng)
            reset_keys = jax.random.split(
                k_reset, n_tasks * n_envs).reshape(n_tasks, n_envs, -1)
            _, obs0 = jax.vmap(lambda ks, t: jax.vmap(
                self.env.reset, in_axes=(0, None))(ks, t))(reset_keys, tasks)
            out = pallas_pointmass_rollout(
                task_params, tasks, obs0, k_noise, horizon=horizon,
                interpret=jax.default_backend() != "tpu")
            # the kernel env is never-done: fill the scan engine's contract
            out["dones"] = jnp.zeros((n_tasks, n_envs, horizon), jnp.bool_)
            out["timesteps"] = jnp.broadcast_to(
                jnp.arange(horizon, dtype=jnp.int32),
                (n_tasks, n_envs, horizon))
            out["env_infos"] = {}
            return out

        def do_rollout(task_params, tasks, rng, floor):
            if use_pallas:
                # the kernel reads log_std raw, so apply the variable-path
                # std floor (policies/gaussian_mlp.py semantics) on the
                # params before handing them in — one jnp.maximum on a
                # (tasks, act_dim) array, keeping the two backends exactly
                # equivalent even when log_std reaches log(1e-6)
                task_params = dict(task_params)
                ls = task_params["log_std_network/log_std_var"]
                task_params["log_std_network/log_std_var"] = jnp.where(
                    floor,
                    jnp.maximum(ls, self.policy.min_log_std), ls)
                return pallas_rollout(task_params, tasks, rng)
            return rollout(self.env, self.policy, task_params, tasks, rng,
                           self.rollouts_per_meta_task, self.max_path_length,
                           floor_std=floor)

        def do_process(traj):
            samples = self.sample_processor.process(traj)
            # env diagnostics — the analog of MetaEnv.log_diagnostics,
            # logged per sampling round (meta_trainer.py:109)
            diag = getattr(self.env, "diagnostics", None)
            if diag is not None:
                samples["stats"].update(diag(samples))
            return samples

        def sample_round(task_params, tasks, rng, floor):
            return do_process(do_rollout(task_params, tasks, rng, floor))

        def adapt(task_params, step_sizes, samples):
            return constrain(self.algo.adapt(task_params, step_sizes, samples))

        def outer(train_state, opt_state, all_data, hparams):
            return self.algo.optimize_policy(train_state, opt_state,
                                             all_data, hparams)

        def policy_fwd(task_params, obs, floor):
            # PolicyExecTime attribution: the same per-step policy forward
            # the rollout scan runs, re-executed over the round's sampled
            # observations (tasks, envs, T, d) -> timing the policy's share
            # of sampling (the analog of meta_sampler.py:133-135)
            return jax.vmap(
                lambda p, o: self.policy.apply(p, o, floor_std=floor))(
                    task_params, obs)

        self._update_tasks = jax.jit(update_tasks)
        # `floor` rides as a traced bool (policies/gaussian_mlp.py applies
        # it with jnp.where) so pre/post-update rounds share ONE program
        self._sample_round = jax.jit(sample_round)
        self._rollout = jax.jit(do_rollout)
        self._process = jax.jit(do_process)
        self._adapt = jax.jit(adapt)
        self._outer = jax.jit(outer)
        self._policy_fwd = jax.jit(policy_fwd)
        self._phase_times = {}

        def iteration(train_state, opt_state, hparams, rng):
            keys = jax.random.split(rng, self.num_inner_grad_steps + 2)
            tasks = update_tasks(keys[0])
            task_params = constrain(self.policy.replicate(
                train_state["params"], self.meta_batch_size))
            all_data = []
            round_stats = []
            for step in range(self.num_inner_grad_steps + 1):
                samples = sample_round(task_params, tasks, keys[step + 1],
                                       step == 0)
                round_stats.append(samples.pop("stats"))
                all_data.append(samples)
                if step < self.num_inner_grad_steps:
                    task_params = adapt(task_params,
                                        train_state["step_sizes"], samples)
            train_state, opt_state, metrics = outer(
                train_state, opt_state, all_data, hparams)
            for step, stats in enumerate(round_stats):
                for k, v in stats.items():
                    metrics[f"Step_{step}-{k}"] = v
            return train_state, opt_state, metrics

        self._iteration = jax.jit(iteration)

    # ------------------------------------------------------------------ train
    def train(self):
        """The master loop (meta_trainer.py:59-152)."""
        steps_per_round = (self.meta_batch_size * self.rollouts_per_meta_task
                           * self.max_path_length)
        n_rounds = self.num_inner_grad_steps + 1

        for itr in range(self.start_itr, self.n_itr):
            itr_start = time.time()
            logger.log(f"\n ---------------- Iteration {itr} ----------------")
            self._rng, it_key = jax.random.split(self._rng)

            profiling = (self.profile_dir is not None
                         and itr == self.profile_itr)
            if profiling:
                jax.profiler.start_trace(self.profile_dir)

            if self.fused:
                self.train_state, self.opt_state, metrics = self._iteration(
                    self.train_state, self.opt_state, self.hparams, it_key)
                metrics = jax.device_get(metrics)
                round_stats = None
            else:
                measure = (self.timing_every <= 1
                           or itr % self.timing_every == 0)
                metrics, round_stats = self._run_phases(it_key, measure)

            if profiling:
                jax.profiler.stop_trace()
                logger.log(f"profiler trace written to {self.profile_dir}")

            self.total_timesteps_sampled += steps_per_round * n_rounds
            self.hparams = self.algo.update_hparams(self.hparams, metrics)

            self._log_metrics(itr, metrics, itr_start)
            logger.save_itr_params(itr, self.get_itr_snapshot(itr))
            logger.dumpkvs()
        logger.sync_snapshots()
        logger.log("Training finished")
        return self.train_state

    def _run_phases(self, it_key, measure=True):
        """Phase-split iteration with Time-* keys (meta_trainer.py:88-142).

        ``measure=True`` takes a host barrier after every phase so each
        Time-* key is real wall-clock (plus the PolicyExecTime /
        EnvExecTime split of sampling, meta_sampler.py:133-135, attributed
        by re-timing the round's policy forwards). ``measure=False`` runs
        the phases back-to-back with ONE sync at the end (async dispatch —
        the throughput mode) and reuses the last measured phase times.
        """
        keys = jax.random.split(it_key, self.num_inner_grad_steps + 2)
        tasks = self._update_tasks(keys[0])
        task_params = self.policy.replicate(self.train_state["params"],
                                            self.meta_batch_size)
        all_data, round_stats = [], []
        t_sampling = t_proc = t_inner = t_policy = 0.0
        for step in range(self.num_inner_grad_steps + 1):
            if measure:
                ts = time.time()
                traj = self._rollout(task_params, tasks, keys[step + 1],
                                     step == 0)
                jax.block_until_ready(traj)
                t_sampling += time.time() - ts
                tp = time.time()
                samples = self._process(traj)
                jax.block_until_ready(samples)
                t_proc += time.time() - tp
                # policy/env split of sampling: time the policy's forwards
                # over the round's observations; the remainder is env time
                tpol = time.time()
                jax.block_until_ready(self._policy_fwd(
                    task_params, traj["observations"], step == 0))
                t_policy += time.time() - tpol
            else:
                samples = self._sample_round(task_params, tasks,
                                             keys[step + 1], step == 0)
            round_stats.append(samples.pop("stats"))
            all_data.append(samples)
            if step < self.num_inner_grad_steps:
                ta = time.time()
                task_params = self._adapt(task_params,
                                          self.train_state["step_sizes"],
                                          samples)
                if measure:
                    jax.block_until_ready(task_params)
                    t_inner += time.time() - ta
        to = time.time()
        self.train_state, self.opt_state, metrics = self._outer(
            self.train_state, self.opt_state, all_data, self.hparams)
        # ONE host transfer for metrics + per-round stats: through a
        # remote-TPU tunnel each device_get is a full round trip, and the
        # per-iteration host cost is latency-, not bandwidth-, bound
        metrics, round_stats = jax.device_get((metrics, round_stats))
        if measure:
            t_outer = time.time() - to
            self._phase_times = {
                "Time-Sampling": t_sampling,
                "Time-SampleProc": t_proc,
                "Time-InnerStep": t_inner,
                "Time-OuterStep": t_outer,
                "Time-MAMLSteps": t_inner + t_outer,
                # clamp the re-timed policy share into the measured sampling
                # window so PolicyExec + EnvExec == Time-Sampling even when
                # host noise makes the re-timing exceed the fused phase
                "PolicyExecTime": min(t_policy, t_sampling),
                "EnvExecTime": max(t_sampling - t_policy, 0.0),
            }
        metrics.update(self._phase_times)
        for step, stats in enumerate(round_stats):
            for k, v in stats.items():
                metrics[f"Step_{step}-{k}"] = v
        return metrics, round_stats

    def _log_metrics(self, itr, metrics, itr_start):
        logger.logkv("Itr", itr)
        logger.logkv("n_timesteps", self.total_timesteps_sampled)
        for k, v in metrics.items():
            if k == "inner_kls":
                continue
            v = np.asarray(v)
            logger.logkv(k, float(v) if v.ndim == 0 else v)
        logger.logkv("ItrTime", time.time() - itr_start)

    def get_itr_snapshot(self, itr):
        """Pickle-able snapshot (meta_trainer.py:154-158)."""
        return dict(
            itr=itr,
            train_state=jax.device_get(self.train_state),
            opt_state=jax.device_get(self.opt_state),
            hparams=jax.device_get(self.hparams),
            rng=jax.device_get(self._rng),
            config=dict(
                meta_batch_size=self.meta_batch_size,
                rollouts_per_meta_task=self.rollouts_per_meta_task,
                max_path_length=self.max_path_length,
                seed=self.seed,
            ),
        )

    def restore(self, snapshot):
        """Resume from a snapshot (meta_trainer.py:30-33 start_itr/sess)."""
        self.train_state = jax.device_put(snapshot["train_state"])
        self.opt_state = jax.device_put(snapshot["opt_state"])
        self.hparams = snapshot["hparams"]
        self._rng = jax.device_put(snapshot["rng"])
        self.start_itr = snapshot["itr"] + 1
