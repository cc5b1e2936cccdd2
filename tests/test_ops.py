"""Unit tests for core ops against independent numpy reference math.

Mirrors the numerical contracts of the reference implementation
(diagonal_gaussian.py closed forms; utils.py discount_cumsum via scipy
lfilter; samplers/base.py GAE; linear_baseline.py ridge fit).
"""
import numpy as np
import pytest
import scipy.signal

import jax
import jax.numpy as jnp

from promp_tpu.ops import distributions as dg
from promp_tpu.ops.baselines import (
    feature_features, fit_linear_baseline, predict_linear_baseline,
    time_features)
from promp_tpu.ops.discounting import (
    discount_cumsum, gae_advantages, normalize_advantages)


def np_discount_cumsum(x, discount):
    # the reference's exact formulation (utils.py:74-81)
    return scipy.signal.lfilter([1], [1, float(-discount)], x[::-1], axis=0)[::-1]


class TestDiagonalGaussian:
    def setup_method(self):
        rng = np.random.RandomState(0)
        self.old = {"mean": rng.randn(7, 3).astype(np.float32),
                    "log_std": rng.randn(7, 3).astype(np.float32) * 0.3}
        self.new = {"mean": rng.randn(7, 3).astype(np.float32),
                    "log_std": rng.randn(7, 3).astype(np.float32) * 0.3}
        self.x = rng.randn(7, 3).astype(np.float32)

    def test_kl_matches_reference_formula(self):
        old_std = np.exp(self.old["log_std"])
        new_std = np.exp(self.new["log_std"])
        numerator = (np.square(self.old["mean"] - self.new["mean"])
                     + np.square(old_std) - np.square(new_std))
        denominator = 2 * np.square(new_std) + 1e-8
        expected = np.sum(numerator / denominator
                          + self.new["log_std"] - self.old["log_std"], axis=-1)
        np.testing.assert_allclose(dg.kl(self.old, self.new), expected,
                                   rtol=1e-5)

    def test_kl_self_zero(self):
        np.testing.assert_allclose(dg.kl(self.old, self.old),
                                   np.zeros(7), atol=1e-6)

    def test_log_likelihood_matches_scipy(self):
        from scipy.stats import norm
        expected = np.sum(norm.logpdf(
            self.x, self.old["mean"], np.exp(self.old["log_std"])), axis=-1)
        np.testing.assert_allclose(
            dg.log_likelihood(self.x, self.old), expected, rtol=1e-4)

    def test_likelihood_ratio_identity(self):
        lr = dg.likelihood_ratio(self.x, self.old, self.old)
        np.testing.assert_allclose(lr, np.ones(7), rtol=1e-5)

    def test_entropy_closed_form(self):
        expected = np.sum(self.old["log_std"]
                          + 0.5 * np.log(2 * np.pi * np.e), axis=-1)
        np.testing.assert_allclose(dg.entropy(self.old), expected, rtol=1e-5)

    def test_sample_statistics(self):
        info = {"mean": jnp.array([[1.0, -2.0]]),
                "log_std": jnp.array([[0.0, 0.5]])}
        keys = jax.random.split(jax.random.PRNGKey(0), 20000)
        samples = jax.vmap(lambda k: dg.sample(k, info))(keys)[:, 0, :]
        np.testing.assert_allclose(np.mean(samples, axis=0), [1.0, -2.0],
                                   atol=0.05)
        np.testing.assert_allclose(np.std(samples, axis=0),
                                   [1.0, np.exp(0.5)], atol=0.05)


class TestDiscounting:
    def test_discount_cumsum_matches_lfilter(self):
        rng = np.random.RandomState(1)
        x = rng.randn(50).astype(np.float32)
        got = discount_cumsum(x, 0.99)
        np.testing.assert_allclose(got, np_discount_cumsum(x, 0.99),
                                   rtol=2e-4, atol=1e-5)

    def test_discount_cumsum_batched(self):
        rng = np.random.RandomState(2)
        x = rng.randn(4, 30).astype(np.float32)
        got = discount_cumsum(x, 0.95)
        for i in range(4):
            np.testing.assert_allclose(got[i], np_discount_cumsum(x[i], 0.95),
                                       rtol=2e-4, atol=1e-5)

    def test_discount_cumsum_with_resets_equals_per_segment(self):
        rng = np.random.RandomState(3)
        x = rng.randn(20).astype(np.float32)
        reset = np.zeros(20, np.float32)
        reset[7] = 1.0  # episode ends at t=7; next episode starts at t=8
        reset[13] = 1.0
        got = discount_cumsum(x, 0.9, reset=reset)
        seg_bounds = [(0, 8), (8, 14), (14, 20)]
        for lo, hi in seg_bounds:
            np.testing.assert_allclose(
                got[lo:hi], np_discount_cumsum(x[lo:hi], 0.9),
                rtol=2e-4, atol=1e-5)

    def test_gae_matches_reference_ragged_math(self):
        rng = np.random.RandomState(4)
        T = 25
        rewards = rng.randn(T).astype(np.float32)
        baselines = rng.randn(T).astype(np.float32)
        discount, lam = 0.99, 0.97
        # reference math (samplers/base.py:151-162)
        pb = np.append(baselines, 0)
        deltas = rewards + discount * pb[1:] - pb[:-1]
        expected = np_discount_cumsum(deltas, discount * lam)
        got = gae_advantages(jnp.array(rewards), jnp.array(baselines),
                             discount, lam)
        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)

    def test_gae_with_resets_equals_per_segment(self):
        rng = np.random.RandomState(5)
        T = 18
        rewards = rng.randn(T).astype(np.float32)
        baselines = rng.randn(T).astype(np.float32)
        reset = np.zeros(T, np.float32)
        reset[9] = 1.0
        got = gae_advantages(jnp.array(rewards), jnp.array(baselines),
                             0.99, 1.0, reset=reset)
        for lo, hi in [(0, 10), (10, 18)]:
            pb = np.append(baselines[lo:hi], 0)
            deltas = rewards[lo:hi] + 0.99 * pb[1:] - pb[:-1]
            expected = np_discount_cumsum(deltas, 0.99)
            np.testing.assert_allclose(got[lo:hi], expected,
                                       rtol=2e-4, atol=1e-5)

    def test_normalize_advantages(self):
        rng = np.random.RandomState(6)
        adv = rng.randn(100).astype(np.float32) * 5 + 3
        out = normalize_advantages(jnp.array(adv))
        assert abs(float(jnp.mean(out))) < 1e-5
        np.testing.assert_allclose(float(jnp.std(out)), 1.0, atol=1e-3)

    def test_normalize_advantages_masked(self):
        rng = np.random.RandomState(7)
        adv = rng.randn(50).astype(np.float32)
        mask = (rng.rand(50) > 0.3).astype(np.float32)
        out = np.asarray(normalize_advantages(jnp.array(adv), mask=mask))
        valid = adv[mask > 0]
        expected = (adv - valid.mean()) / (valid.std() + 1e-8)
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


class TestLinearBaseline:
    def _ref_fit(self, featmat, target, reg=1e-5):
        # linear_baseline.py:66-77
        return np.linalg.lstsq(
            featmat.T @ featmat + reg * np.eye(featmat.shape[1]),
            featmat.T @ target, rcond=-1)[0]

    def test_features_match_reference(self):
        rng = np.random.RandomState(8)
        T, d = 12, 3
        obs = (rng.randn(T, d) * 8).astype(np.float32)
        ts = np.arange(T)
        got = np.asarray(feature_features(jnp.array(obs), jnp.array(ts)))
        o = np.clip(obs, -10, 10)
        t = ts.reshape(-1, 1) / 100.0
        expected = np.concatenate([o, o**2, t, t**2, t**3, np.ones((T, 1))],
                                  axis=1)
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_time_features_match_reference(self):
        T = 9
        ts = np.arange(T)
        got = np.asarray(time_features(jnp.array(ts)))
        t = ts.reshape(-1, 1) / 100.0
        expected = np.concatenate([t, t**2, t**3, np.ones((T, 1))], axis=1)
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_fit_matches_numpy_solve(self):
        rng = np.random.RandomState(9)
        F = rng.randn(200, 10).astype(np.float32)
        y = (F @ rng.randn(10) + 0.01 * rng.randn(200)).astype(np.float32)
        got = np.asarray(fit_linear_baseline(jnp.array(F), jnp.array(y)))
        expected = self._ref_fit(F, y)
        np.testing.assert_allclose(got, expected, rtol=1e-2, atol=1e-3)

    def test_fit_reduces_error(self):
        rng = np.random.RandomState(10)
        T, d = 30, 4
        obs = rng.randn(5, T, d).astype(np.float32)
        ts = np.tile(np.arange(T), (5, 1))
        returns = np.cumsum(rng.randn(5, T), axis=1).astype(np.float32)
        feats = feature_features(jnp.array(obs), jnp.array(ts))
        coeffs = fit_linear_baseline(
            feats.reshape(-1, feats.shape[-1]),
            jnp.array(returns).reshape(-1))
        pred = np.asarray(predict_linear_baseline(feats, coeffs))
        err_fit = np.mean((pred - returns) ** 2)
        err_zero = np.mean(returns ** 2)
        assert err_fit < err_zero

    def test_masked_fit_ignores_masked_rows(self):
        rng = np.random.RandomState(11)
        F = rng.randn(100, 5).astype(np.float32)
        y = (F @ rng.randn(5)).astype(np.float32)
        mask = np.ones(100, np.float32)
        mask[60:] = 0.0
        got = np.asarray(fit_linear_baseline(jnp.array(F), jnp.array(y),
                                             mask=jnp.array(mask)))
        expected = self._ref_fit(F[:60], y[:60])
        np.testing.assert_allclose(got, expected, rtol=1e-2, atol=1e-3)
