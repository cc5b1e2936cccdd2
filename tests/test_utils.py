"""Tests for promp_tpu.utils.misc (reference utils/utils.py parity)."""
import numpy as np
import pytest

from promp_tpu.utils import (
    concat_tensor_dict_list,
    explained_variance_1d,
    extract,
    set_seed,
    stack_tensor_dict_list,
)


class TestExtract:
    def test_dict(self):
        d = {"a": 1, "b": 2, "c": 3}
        assert extract(d, "c", "a") == (3, 1)

    def test_list_of_dicts(self):
        ds = [{"a": 1, "b": 10}, {"a": 2, "b": 20}]
        a, b = extract(ds, "a", "b")
        assert a == [1, 2] and b == [10, 20]

    def test_unsupported(self):
        with pytest.raises(NotImplementedError):
            extract(42, "a")


class TestExplainedVariance:
    def test_perfect_prediction(self):
        y = np.random.RandomState(0).randn(100)
        assert explained_variance_1d(y, y) == pytest.approx(1.0, abs=1e-6)

    def test_mean_prediction_is_zero(self):
        y = np.random.RandomState(1).randn(1000)
        ev = explained_variance_1d(np.full_like(y, y.mean()), y)
        assert ev == pytest.approx(0.0, abs=1e-6)

    def test_constant_target(self):
        y = np.ones(10)
        assert explained_variance_1d(np.ones(10), y) == 1.0
        assert explained_variance_1d(np.arange(10.0), y) == 0.0

    def test_worse_than_mean_is_negative(self):
        y = np.random.RandomState(2).randn(500)
        assert explained_variance_1d(-3 * y, y) < 0


class TestTensorDictHelpers:
    def _dicts(self):
        return [
            {"x": np.ones((2, 3)), "info": {"r": np.zeros(2)}},
            {"x": 2 * np.ones((4, 3)), "info": {"r": np.ones(4)}},
        ]

    def test_concat(self):
        out = concat_tensor_dict_list(self._dicts())
        assert out["x"].shape == (6, 3)
        assert out["info"]["r"].shape == (6,)
        np.testing.assert_array_equal(out["x"][:2], 1.0)
        np.testing.assert_array_equal(out["x"][2:], 2.0)

    def test_stack(self):
        ds = [{"x": np.ones(3), "info": {"r": np.zeros(2)}},
              {"x": np.zeros(3), "info": {"r": np.ones(2)}}]
        out = stack_tensor_dict_list(ds)
        assert out["x"].shape == (2, 3)
        assert out["info"]["r"].shape == (2, 2)


class TestSetSeed:
    def test_numpy_determinism_and_key(self):
        k1 = set_seed(123)
        a = np.random.rand(4)
        k2 = set_seed(123)
        b = np.random.rand(4)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))

    def test_large_seed_wraps(self):
        set_seed(2**63 - 1)
