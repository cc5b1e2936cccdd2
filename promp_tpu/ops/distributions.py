"""Diagonal Gaussian distribution ops.

TPU-native, purely functional analog of the reference's distribution stack
(reference: meta_policy_search/policies/distributions/diagonal_gaussian.py).
All functions operate on ``dist_info`` dicts ``{"mean": (..., d), "log_std":
(..., d)}`` and broadcast over arbitrary leading batch axes, so the same code
serves the per-step, per-task and per-meta-batch cases that the reference
builds as meta_batch_size separate TF sub-graphs (SURVEY.md §2.4).

Numerics mirror the reference exactly (including the ``1e-8`` regularizer in
the KL denominator, diagonal_gaussian.py:16-44) so that losses/KLs are
comparable across frameworks.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG_2PI = math.log(2.0 * math.pi)


def kl(old, new):
    """KL(old || new) for diagonal Gaussians, summed over the event axis.

    Mirrors diagonal_gaussian.py:16-44 (note the 1e-8 in the denominator).
    """
    old_means, old_log_stds = old["mean"], old["log_std"]
    new_means, new_log_stds = new["mean"], new["log_std"]
    old_std = jnp.exp(old_log_stds)
    new_std = jnp.exp(new_log_stds)
    numerator = jnp.square(old_means - new_means) + jnp.square(old_std) - jnp.square(new_std)
    denominator = 2.0 * jnp.square(new_std) + 1e-8
    return jnp.sum(numerator / denominator + new_log_stds - old_log_stds, axis=-1)


def log_likelihood(x, dist_info):
    """log p(x) under the diagonal Gaussian (diagonal_gaussian.py:89-109)."""
    means, log_stds = dist_info["mean"], dist_info["log_std"]
    dim = x.shape[-1]
    zs = (x - means) / jnp.exp(log_stds)
    return (
        -jnp.sum(log_stds, axis=-1)
        - 0.5 * jnp.sum(jnp.square(zs), axis=-1)
        - 0.5 * dim * LOG_2PI
    )


def likelihood_ratio(x, old, new):
    """exp(log p_new(x) - log p_old(x)) (diagonal_gaussian.py:71-87)."""
    return jnp.exp(log_likelihood(x, new) - log_likelihood(x, old))


def entropy(dist_info):
    """Differential entropy (diagonal_gaussian.py:129-140)."""
    log_stds = dist_info["log_std"]
    return jnp.sum(log_stds + 0.5 * math.log(2.0 * math.pi * math.e), axis=-1)


def sample(key, dist_info):
    """Draw a sample, counter-based PRNG replacing numpy (diagonal_gaussian.py:155-168)."""
    means, log_stds = dist_info["mean"], dist_info["log_std"]
    noise = jax.random.normal(key, means.shape, dtype=means.dtype)
    return means + noise * jnp.exp(log_stds)


def dist_info_specs(dim):
    return [("mean", (dim,)), ("log_std", (dim,))]
