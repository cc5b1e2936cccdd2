"""Object-style baseline API mirroring the reference's class surface.

The processors use the functional ops in :mod:`promp_tpu.ops.baselines`
directly; these thin classes exist for API parity with the reference's
``Baseline`` hierarchy (reference: meta_policy_search/baselines/base.py,
linear_baseline.py, zero_baseline.py) so code written against the
reference's fit/predict/get-set-params interface ports unchanged.

``fit`` consumes fixed-shape buffers — observations (P, T, obs),
timesteps (P, T), targets (P, T), optional mask — the batched analog of
the reference's ragged path lists.
"""
from __future__ import annotations

import jax.numpy as jnp

from promp_tpu.ops import baselines as ops


class Baseline:
    """Interface (reference baselines/base.py:4-53)."""

    _coeffs = None

    def fit(self, observations, timesteps, targets, mask=None):
        raise NotImplementedError

    def predict(self, observations, timesteps):
        raise NotImplementedError

    def get_param_values(self, **tags):
        return self._coeffs

    def set_params(self, value, **tags):
        self._coeffs = value


class ZeroBaseline(Baseline):
    """reference zero_baseline.py — always predicts zeros."""

    def fit(self, observations, timesteps, targets, mask=None):
        pass

    def predict(self, observations, timesteps):
        return jnp.zeros(timesteps.shape, jnp.float32)


class LinearFeatureBaseline(Baseline):
    """Ridge fit on [obs, obs^2, t/100, (t/100)^2, (t/100)^3, 1]
    (reference linear_baseline.py:83-106)."""

    def __init__(self, reg_coeff=1e-5):
        self._reg_coeff = reg_coeff
        self._coeffs = None

    def _features(self, observations, timesteps):
        return ops.feature_features(observations, timesteps)

    def fit(self, observations, timesteps, targets, mask=None):
        feats = self._features(observations, timesteps)
        self._coeffs = ops.fit_linear_baseline(
            feats.reshape(-1, feats.shape[-1]),
            jnp.asarray(targets).reshape(-1),
            mask=None if mask is None else jnp.asarray(mask).reshape(-1),
            reg_coeff=self._reg_coeff)

    def predict(self, observations, timesteps):
        if self._coeffs is None:
            return jnp.zeros(jnp.asarray(timesteps).shape, jnp.float32)
        feats = self._features(observations, timesteps)
        return ops.predict_linear_baseline(feats, self._coeffs)


class LinearTimeBaseline(LinearFeatureBaseline):
    """Time-only features (reference linear_baseline.py:109-127)."""

    def _features(self, observations, timesteps):
        return ops.time_features(jnp.asarray(timesteps))
