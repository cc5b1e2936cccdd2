"""Time-major DICE sample processing (padding + mask semantics).

TPU-native replacement for the reference's DICE processors (reference:
meta_policy_search/samplers/dice_sample_processor.py and
meta_sample_processor.py:51-52 ``DiceMetaSampleProcessor``). Steps mirrored:

  1. per-step discounted rewards  r_t * gamma^t          (:147-153)
  2. fit the time baseline on discounted rewards, adjusted = r_disc - b
     (:98-102, :155-162)
  3. zero-pad to max_path_length + binary mask           (:164-197)
  4. optional normalization of adjusted rewards — note the reference
     normalizes over the PADDED arrays, zeros included (:107-111 with
     utils.normalize_advantages); mirrored faithfully
  5. optional ``return_baseline`` -> padded GAE advantages (:199-236)

The rollout engine produces fixed-shape (tasks, envs, T) streams; each env
stream is interpreted as one path whose valid prefix runs to its first done
(or the horizon). This is exactly the reference's path structure whenever
episodes terminate at most once per horizon — true for every bundled env.
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


def prefix_mask(dones):
    """1.0 through the first done position (inclusive), 0.0 after."""
    d = dones.astype(jnp.float32)
    prior = jnp.concatenate(
        [jnp.zeros_like(d[..., :1]), jnp.cumsum(d, axis=-1)[..., :-1]], axis=-1)
    return (prior < 0.5).astype(jnp.float32)


@dataclass(frozen=True)
class DiceSampleProcessor:
    """Config mirrors dice_sample_processor.py:26-47 defaults."""

    max_path_length: int = 100
    discount: float = 0.99
    gae_lambda: float = 1.0
    normalize_adv: bool = True
    positive_adv: bool = False
    baseline: str = "LinearTimeBaseline"
    return_baseline: str | None = None  # e.g. "LinearFeatureBaseline"
    reg_coeff: float = 1e-5

    def _fit_predict(self, kind, observations, timesteps, targets, mask):
        if kind == "ZeroBaseline":
            return jnp.zeros_like(targets)
        if kind == "LinearTimeBaseline":
            feats = bl.time_features(timesteps, targets.dtype)
        else:
            feats = bl.feature_features(observations, timesteps)
        flat = feats.reshape(-1, feats.shape[-1])
        coeffs = bl.fit_linear_baseline(
            flat, targets.reshape(-1), mask=mask.reshape(-1),
            reg_coeff=self.reg_coeff)
        return bl.predict_linear_baseline(feats, coeffs)

    def process(self, traj):
        """traj -> DICE samples_data with (tasks, P, T) time-major leaves.

        Keys mirror dice_sample_processor.py:66-74: mask, observations,
        actions, rewards, adjusted_rewards (+ advantages when
        ``return_baseline`` is set), env_infos/agent_infos passthrough.
        """
        rewards = traj["rewards"]
        dones = traj["dones"]
        timesteps = traj["timesteps"]
        mask = prefix_mask(dones)

        # gamma^t per within-path step (dice_sample_processor.py:147-153)
        gammas = self.discount ** timesteps.astype(rewards.dtype)
        discounted = rewards * gammas * mask

        per_task = jax.vmap(
            lambda o, t, y, m: self._fit_predict(self.baseline, o, t, y, m))
        baselines = per_task(traj["observations"], timesteps, discounted, mask)
        adjusted = (discounted - baselines) * mask

        if self.normalize_adv:
            # normalized over padded entries, matching the reference
            adjusted = jax.vmap(normalize_advantages)(adjusted)
        if self.positive_adv:
            adjusted = jax.vmap(shift_advantages_to_positive)(adjusted)

        samples_data = dict(
            mask=mask,
            observations=traj["observations"] * mask[..., None],
            actions=traj["actions"] * mask[..., None],
            rewards=rewards * mask,
            dones=dones,
            timesteps=timesteps,
            adjusted_rewards=adjusted,
            agent_infos=jax.tree.map(
                lambda x: x * mask[..., None], traj["agent_infos"]),
            env_infos=jax.tree.map(lambda x: x * mask, traj["env_infos"]),
        )

        if self.return_baseline is not None:
            returns = discount_cumsum(rewards, self.discount,
                                      reset=dones.astype(rewards.dtype))
            rb = jax.vmap(
                lambda o, t, y, m: self._fit_predict(
                    self.return_baseline, o, t, y, m))(
                traj["observations"], timesteps, returns * mask, mask)
            adv = gae_advantages(rewards, rb, self.discount, self.gae_lambda,
                                 reset=dones.astype(rewards.dtype)) * mask
            if self.normalize_adv:
                adv = jax.vmap(normalize_advantages)(adv)
            if self.positive_adv:
                adv = jax.vmap(shift_advantages_to_positive)(adv)
            samples_data["advantages"] = adv
            samples_data["returns"] = returns * mask

        # E-MAML adjusted average rewards over the whole meta-batch
        # (meta_sample_processor.py:39-44 via DiceMetaSampleProcessor)
        masked_rewards = samples_data["rewards"]
        overall_mean = jnp.mean(masked_rewards)
        overall_std = jnp.std(masked_rewards)
        samples_data["adj_avg_rewards"] = (
            (masked_rewards - overall_mean) / (overall_std + 1e-8))

        # path statistics (dice_sample_processor.py:131-145)
        path_returns = jnp.sum(masked_rewards, axis=-1)  # (tasks, P)
        samples_data["stats"] = dict(
            AverageReturn=jnp.mean(path_returns),
            AverageDiscountedReturn=jnp.mean(jnp.sum(discounted, axis=-1)),
            NumTrajs=jnp.asarray(path_returns.size, jnp.float32),
            StdReturn=jnp.std(path_returns),
            MaxReturn=jnp.max(path_returns),
            MinReturn=jnp.min(path_returns),
            AveragePolicyStd=jnp.mean(
                jnp.exp(traj["agent_infos"]["log_std"])),
        )
        return samples_data


DiceMetaSampleProcessor = DiceSampleProcessor
