"""On-device linear reward baselines (ridge regression).

TPU-native replacement for the reference's numpy least-squares baselines
(reference: meta_policy_search/baselines/linear_baseline.py). The reference
loops over ragged paths on the host and calls ``np.linalg.lstsq`` per task
per sampling round; here the feature matrices are built on fixed-shape
``(..., T, obs)`` buffers and the (tiny, <=~45-dim) normal-equation solves are
batched with ``vmap`` over the meta-task axis so all ``meta_batch_size``
fits happen in one fused XLA computation.

Feature sets mirror linear_baseline.py:
  * LinearFeatureBaseline (:101-106): [clip(obs,+-10), obs^2, t/100,
    (t/100)^2, (t/100)^3, 1]
  * LinearTimeBaseline (:122-126):   [t/100, (t/100)^2, (t/100)^3, 1]
with the NaN -> reg*10 retry ladder of linear_baseline.py:69-77 implemented
as a branchless 5-step scan (each candidate solve is cheap; selecting the
first non-NaN one with ``jnp.where`` avoids host round-trips).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def feature_features(obs, timesteps):
    """Per-step features of LinearFeatureBaseline (linear_baseline.py:101-106).

    Args:
        obs: (..., T, obs_dim) observations.
        timesteps: (..., T) segment-relative step index (0-based). For ragged
            auto-reset streams pass the per-segment time so padding/reset
            semantics match the reference's per-path ``np.arange``.

    Returns:
        (..., T, 2*obs_dim + 4) feature matrix.
    """
    o = jnp.clip(obs, -10.0, 10.0)
    t = (timesteps[..., None].astype(o.dtype)) / 100.0
    ones = jnp.ones_like(t)
    return jnp.concatenate([o, o**2, t, t**2, t**3, ones], axis=-1)


def time_features(timesteps, dtype=jnp.float32):
    """Per-step features of LinearTimeBaseline (linear_baseline.py:122-126)."""
    t = (timesteps[..., None].astype(dtype)) / 100.0
    ones = jnp.ones_like(t)
    return jnp.concatenate([t, t**2, t**3, ones], axis=-1)


def fit_linear_baseline(feats, targets, mask=None, reg_coeff=1e-5, n_retries=5):
    """Ridge-regularized least squares with the reference's NaN retry ladder.

    Solves ``(F^T F + reg I) c = F^T y`` (linear_baseline.py:66-77). Rows can
    be soft-disabled via ``mask`` (0/1), which reproduces fitting on only the
    valid (non-padded) steps of ragged paths.

    Args:
        feats: (N, F) feature rows (flatten path/time axes first).
        targets: (N,) regression targets.
        mask: optional (N,) validity of each row.
        reg_coeff: initial ridge coefficient.
        n_retries: size of the reg*10 ladder.

    Returns:
        (F,) coefficients.
    """
    if mask is not None:
        w = jnp.asarray(mask, feats.dtype)
        feats = feats * w[:, None]
        targets = targets * w
    gram = feats.T @ feats
    rhs = feats.T @ targets
    eye = jnp.eye(gram.shape[0], dtype=gram.dtype)

    regs = reg_coeff * (10.0 ** jnp.arange(n_retries, dtype=gram.dtype))

    def solve_one(reg):
        return jnp.linalg.solve(gram + reg * eye, rhs)

    candidates = jax.vmap(solve_one)(regs)  # (n_retries, F)
    ok = ~jnp.any(jnp.isnan(candidates) | jnp.isinf(candidates), axis=-1)
    # index of first valid solve; falls back to the last candidate
    idx = jnp.argmax(ok)
    idx = jnp.where(jnp.any(ok), idx, n_retries - 1)
    return candidates[idx]


def predict_linear_baseline(feats, coeffs):
    """(..., F) @ (F,) -> (...)."""
    return feats @ coeffs


@partial(jax.jit, static_argnames=("n_retries",))
def fit_predict_feature_baseline(obs, timesteps, targets, mask=None,
                                 reg_coeff=1e-5, n_retries=5):
    """Fit LinearFeatureBaseline on one task's rollouts and predict.

    Args:
        obs: (P, T, obs_dim); timesteps: (P, T); targets: (P, T);
        mask: optional (P, T).

    Returns:
        (P, T) baseline predictions.
    """
    feats = feature_features(obs, timesteps)
    flat = feats.reshape(-1, feats.shape[-1])
    coeffs = fit_linear_baseline(
        flat, targets.reshape(-1),
        mask=None if mask is None else mask.reshape(-1),
        reg_coeff=reg_coeff, n_retries=n_retries)
    return predict_linear_baseline(feats, coeffs)
