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
    # jax.profiler trace capture (SURVEY.md §5.1: the reference has only
    # coarse wall-clock keys; we add real device traces): directory to
    # write a trace into, and which iteration to capture.
    profile_dir: Optional[str] = None
    profile_itr: int = 2

    def __post_init__(self):
        self.num_inner_grad_steps = self.algo.num_inner_grad_steps
        self._build()

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

        def sample_round(task_params, tasks, rng, floor):
            traj = rollout(self.env, self.policy, task_params, tasks, rng,
                           self.rollouts_per_meta_task, self.max_path_length,
                           floor_std=floor)
            return self.sample_processor.process(traj)

        def adapt(task_params, step_sizes, samples):
            return constrain(self.algo.adapt(task_params, step_sizes, samples))

        def outer(train_state, opt_state, all_data, hparams):
            return self.algo.optimize_policy(train_state, opt_state,
                                             all_data, hparams)

        self._update_tasks = jax.jit(update_tasks)
        # `floor` rides as a traced bool (policies/gaussian_mlp.py applies
        # it with jnp.where) so pre/post-update rounds share ONE program
        self._sample_round = jax.jit(sample_round)
        self._adapt = jax.jit(adapt)
        self._outer = jax.jit(outer)

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
                metrics, round_stats = self._run_phases(it_key)

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

    def _run_phases(self, it_key):
        """Phase-split iteration with Time-* keys (meta_trainer.py:88-142)."""
        keys = jax.random.split(it_key, self.num_inner_grad_steps + 2)
        t0 = time.time()
        tasks = self._update_tasks(keys[0])
        task_params = self.policy.replicate(self.train_state["params"],
                                            self.meta_batch_size)
        all_data, round_stats = [], []
        t_sampling = t_inner = 0.0
        diag_keys = tuple(getattr(self.env, "diagnostics_keys", ()) or ())
        for step in range(self.num_inner_grad_steps + 1):
            ts = time.time()
            samples = self._sample_round(task_params, tasks, keys[step + 1],
                                         step == 0)
            stats = samples.pop("stats")
            # env diagnostics (the analog of MetaEnv.log_diagnostics, e.g.
            # AvgForwardVel — half_cheetah_rand_vel.py:57-64)
            for k in diag_keys:
                if k in samples["env_infos"]:
                    stats[f"Env-{k}"] = jnp.mean(samples["env_infos"][k])
            jax.block_until_ready(samples)
            t_sampling += time.time() - ts
            round_stats.append(stats)
            all_data.append(samples)
            if step < self.num_inner_grad_steps:
                ta = time.time()
                task_params = self._adapt(task_params,
                                          self.train_state["step_sizes"],
                                          samples)
                jax.block_until_ready(task_params)
                t_inner += time.time() - ta
        to = time.time()
        self.train_state, self.opt_state, metrics = self._outer(
            self.train_state, self.opt_state, all_data, self.hparams)
        metrics = jax.device_get(metrics)
        t_outer = time.time() - to
        metrics["Time-Sampling"] = t_sampling
        metrics["Time-InnerStep"] = t_inner
        metrics["Time-OuterStep"] = t_outer
        metrics["Time-MAMLSteps"] = t_inner + t_outer
        for step, stats in enumerate(jax.device_get(round_stats)):
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
