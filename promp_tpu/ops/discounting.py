"""Discounted-return / GAE ops as O(log T)-depth scans.

TPU-native replacement for the reference's per-path numpy loops
(reference: meta_policy_search/utils/utils.py:74-81 ``discount_cumsum`` via
scipy lfilter; meta_policy_search/samplers/base.py:151-162 GAE). The
reference processes a ragged list of paths one at a time on the host; here
every op is batched over arbitrary leading axes, works on fixed-shape
``(..., T)`` buffers, and supports mid-stream episode boundaries through a
``reset`` indicator — which makes the fused rollout engine's auto-reset
streams process identically to ragged paths (the masked-equivalence contract
of reference tests/test_samplers.py:308-361).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def discount_cumsum(x, discount, reset=None, axis=-1):
    """Reverse discounted cumulative sum along ``axis``.

    y_t = x_t + discount * y_{t+1}, with y reset to x at episode boundaries.

    Args:
        x: (..., T, ...) array.
        discount: scalar discount factor.
        reset: optional same-shape 0/1 array; ``reset[t] == 1`` means the
            step at ``t`` is the LAST step of an episode (done flag), so the
            recursion does not propagate across ``t`` -> ``t+1`` boundaries.
        axis: time axis.

    Implemented as an associative scan over affine maps (a, b) representing
    y -> a*y + b, giving O(log T) depth on TPU instead of the reference's
    sequential lfilter (utils.py:74-81).
    """
    x = jnp.asarray(x)
    axis = axis % x.ndim
    xr = jnp.flip(x, axis=axis)
    if reset is None:
        a = jnp.full_like(xr, discount)
    else:
        cont = 1.0 - jnp.flip(jnp.asarray(reset, dtype=x.dtype), axis=axis)
        a = discount * cont

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, b_r + a_r * b_l

    # Scanning the *reversed* sequence forward: y_rev[i] = a_rev[i] *
    # y_rev[i-1] + x_rev[i] with implicit y_rev[-1] = 0, so the prefix
    # composition's offset component is exactly y_rev[i] (a_rev[0] never
    # contributes since it multiplies 0).
    _, y_rev = jax.lax.associative_scan(combine, (a, xr), axis=axis)
    return jnp.flip(y_rev, axis=axis)


def gae_advantages(rewards, baselines, discount, gae_lambda, reset=None):
    """Generalized Advantage Estimation on fixed-shape (..., T) buffers.

    Mirrors samplers/base.py:151-162: ``deltas = r + discount * V(s') - V(s)``
    with V appended 0 past the final step, then a discounted cumsum of deltas
    with factor ``discount * gae_lambda``. ``reset`` marks episode-final steps
    so that V(s') is treated as 0 across boundaries (the ragged-path analog).
    """
    next_baselines = jnp.concatenate(
        [baselines[..., 1:], jnp.zeros_like(baselines[..., :1])], axis=-1
    )
    if reset is not None:
        next_baselines = next_baselines * (1.0 - jnp.asarray(reset, rewards.dtype))
    deltas = rewards + discount * next_baselines - baselines
    return discount_cumsum(deltas, discount * gae_lambda, reset=reset)


def normalize_advantages(advantages, mask=None):
    """Zero-mean unit-std normalization (utils.py:59-64), mask-aware.

    With a mask, the mean/std are computed only over valid entries — which is
    exactly what the reference computes on its ragged concatenated paths.
    """
    if mask is None:
        mean = jnp.mean(advantages)
        std = jnp.std(advantages)
    else:
        mask = jnp.asarray(mask, advantages.dtype)
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        mean = jnp.sum(advantages * mask) / denom
        var = jnp.sum(jnp.square(advantages - mean) * mask) / denom
        std = jnp.sqrt(var)
    return (advantages - mean) / (std + 1e-8)


def shift_advantages_to_positive(advantages):
    """utils.py:67-71."""
    return (advantages - jnp.min(advantages)) + 1e-8
