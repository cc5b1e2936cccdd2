"""On-device sample processing: returns, baseline, GAE, normalization.

TPU-native replacement for the reference's host-side processors
(reference: meta_policy_search/samplers/base.py:99-173 ``SampleProcessor``
and meta_policy_search/samplers/meta_sample_processor.py
``MetaSampleProcessor``). The reference loops over ragged path lists per
task; here the whole meta-batch is processed in one fused computation on
``(tasks, envs, T)`` buffers, with episode boundaries handled by the
reset-aware scans in :mod:`promp_tpu.ops.discounting` — numerically
identical to the ragged-path math when segments are extracted (the
contract pinned by reference tests/test_samplers.py:172-189, 308-361).

Per-task steps (mirroring samplers/base.py:99-133):
  1. returns   = discount_cumsum(rewards, gamma)               (:102-104)
  2. baseline  fit on returns -> per-step predictions          (:106-108)
  3. advantages = GAE(gamma, lambda)                           (:151-162)
  4. optional advantage normalization / positive shift         (:117-120)
plus the E-MAML ``adj_avg_rewards`` z-scored across the whole meta-batch
(meta_sample_processor.py:39-44).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from promp_tpu.ops import baselines as bl
from promp_tpu.ops.discounting import (
    discount_cumsum,
    gae_advantages,
    normalize_advantages,
    shift_advantages_to_positive,
)
from promp_tpu.sampling.rollout import segment_returns, segment_starts


@dataclass(frozen=True)
class SampleProcessor:
    """Config mirrors samplers/base.py:48-55 defaults."""

    discount: float = 0.99
    gae_lambda: float = 1.0
    normalize_adv: bool = False
    positive_adv: bool = False
    baseline: str = "LinearFeatureBaseline"  # | LinearTimeBaseline | ZeroBaseline
    reg_coeff: float = 1e-5

    def _baseline_predictions(self, observations, timesteps, targets):
        """Fit + predict the configured baseline for ONE task's buffers."""
        if self.baseline == "ZeroBaseline":
            return jnp.zeros_like(targets)
        if self.baseline == "LinearTimeBaseline":
            feats = bl.time_features(timesteps, observations.dtype)
        else:
            feats = bl.feature_features(observations, timesteps)
        flat = feats.reshape(-1, feats.shape[-1])
        coeffs = bl.fit_linear_baseline(flat, targets.reshape(-1),
                                        reg_coeff=self.reg_coeff)
        return bl.predict_linear_baseline(feats, coeffs)

    def process(self, traj):
        """traj: rollout() output. Returns samples_data + stats (all on device).

        samples_data keys mirror the reference contract
        (samplers/base.py:94): observations, actions, rewards, returns,
        advantages, agent_infos, plus dones/timesteps/adj_avg_rewards and
        env_infos passthrough. Leading shape (tasks, envs, T).
        """
        rewards = traj["rewards"]
        dones = traj["dones"].astype(rewards.dtype)
        timesteps = traj["timesteps"]

        returns = discount_cumsum(rewards, self.discount, reset=dones)

        baselines = jax.vmap(self._baseline_predictions)(
            traj["observations"], timesteps, returns)

        advantages = gae_advantages(rewards, baselines, self.discount,
                                    self.gae_lambda, reset=dones)

        if self.normalize_adv:
            # per meta-task normalization: the reference normalizes inside
            # each task's _compute_samples_data (meta_sample_processor.py:34)
            advantages = jax.vmap(normalize_advantages)(advantages)
        if self.positive_adv:
            advantages = jax.vmap(shift_advantages_to_positive)(advantages)

        # E-MAML adjusted average rewards, z-scored over the ENTIRE
        # meta-batch (meta_sample_processor.py:39-44)
        overall_mean = jnp.mean(rewards)
        overall_std = jnp.std(rewards)
        adj_avg_rewards = (rewards - overall_mean) / (overall_std + 1e-8)

        samples_data = dict(
            observations=traj["observations"],
            actions=traj["actions"],
            rewards=rewards,
            dones=traj["dones"],
            timesteps=timesteps,
            returns=returns,
            advantages=advantages,
            adj_avg_rewards=adj_avg_rewards,
            agent_infos=traj["agent_infos"],
            env_infos=traj["env_infos"],
        )
        samples_data["stats"] = self._stats(traj, returns)
        return samples_data

    def _stats(self, traj, returns):
        """Path statistics (samplers/base.py:135-149) from segment masks."""
        rewards = traj["rewards"]
        seg_sums, seg_ends = segment_returns(
            rewards, traj["timesteps"], traj["dones"])
        starts = segment_starts(traj["timesteps"])
        n_trajs = jnp.sum(starts)
        undisc = jnp.sum(seg_sums) / jnp.maximum(jnp.sum(seg_ends), 1.0)
        # per-segment max/min need masked reductions over end positions
        neg_inf = jnp.full_like(seg_sums, -jnp.inf)
        pos_inf = jnp.full_like(seg_sums, jnp.inf)
        max_ret = jnp.max(jnp.where(seg_ends > 0, seg_sums, neg_inf))
        min_ret = jnp.min(jnp.where(seg_ends > 0, seg_sums, pos_inf))
        sum_sq = jnp.sum(jnp.where(seg_ends > 0, seg_sums**2, 0.0))
        n_ends = jnp.maximum(jnp.sum(seg_ends), 1.0)
        std_ret = jnp.sqrt(jnp.maximum(sum_sq / n_ends - undisc**2, 0.0))
        disc = jnp.sum(returns * starts) / jnp.maximum(jnp.sum(starts), 1.0)
        return dict(
            AverageReturn=undisc,
            AverageDiscountedReturn=disc,
            NumTrajs=n_trajs,
            StdReturn=std_ret,
            MaxReturn=max_ret,
            MinReturn=min_ret,
            AveragePolicyStd=jnp.mean(jnp.exp(traj["agent_infos"]["log_std"])),
        )


# The reference exposes MetaSampleProcessor as a thin per-task loop over
# SampleProcessor (meta_sample_processor.py:6-49); our SampleProcessor is
# already meta-batched, so the alias documents API parity.
MetaSampleProcessor = SampleProcessor
