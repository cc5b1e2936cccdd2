"""Small utility helpers mirroring the reference's ``utils/utils.py``.

Reference parity map (meta_policy_search/utils/utils.py):
  - ``extract``                 utils.py:43-56
  - ``explained_variance_1d``   utils.py:84-101
  - ``concat_tensor_dict_list`` utils.py:104-121
  - ``stack_tensor_dict_list``  utils.py:124-141
  - ``set_seed``                utils.py:161-177 (python/numpy seeding; the
    TF part maps to returning a root ``jax.random.PRNGKey``)

``normalize_advantages`` / ``shift_advantages_to_positive`` (utils.py:59-71)
and ``discount_cumsum`` (utils.py:74-81) live in ``promp_tpu.ops.discounting``
as jitted device ops; ``create_feed_dict`` (utils.py:144-159) has no analog
(JAX functions take arrays directly); ``ClassEncoder`` (utils.py:179-185)
lives in ``promp_tpu.run``.
"""
from __future__ import annotations

import random

import numpy as np


def extract(x, *keys):
    """Extract values for ``keys`` from a dict or a list of dicts.

    Mirrors utils.py:43-56: dict -> tuple of values; list of dicts ->
    tuple of lists, one per key.
    """
    if isinstance(x, dict):
        return tuple(x[k] for k in keys)
    if isinstance(x, (list, tuple)):
        return tuple([xi[k] for xi in x] for k in keys)
    raise NotImplementedError(f"extract: unsupported container {type(x)}")


def explained_variance_1d(ypred, y):
    """Fraction of y's variance explained by ypred (utils.py:84-101).

    Returns 0 when Var[y] == 0 and ypred is constant, NaN-signals a
    degenerate fit by returning a large negative number otherwise — same
    convention as the reference (1 - Var[y - ypred] / Var[y]).
    """
    ypred = np.asarray(ypred, dtype=np.float64).ravel()
    y = np.asarray(y, dtype=np.float64).ravel()
    assert y.shape == ypred.shape
    vary = np.var(y)
    if np.isclose(vary, 0):
        if np.var(ypred) > 0:
            return 0.0
        return 1.0
    return float(1.0 - np.var(y - ypred) / (vary + 1e-8))


def concat_tensor_dict_list(tensor_dict_list):
    """Concatenate a list of (possibly nested) dicts of arrays along axis 0.

    Mirrors utils.py:104-121 (recurses into sub-dicts).
    """
    keys = tensor_dict_list[0].keys()
    out = {}
    for k in keys:
        example = tensor_dict_list[0][k]
        if isinstance(example, dict):
            out[k] = concat_tensor_dict_list([d[k] for d in tensor_dict_list])
        else:
            out[k] = np.concatenate([d[k] for d in tensor_dict_list], axis=0)
    return out


def stack_tensor_dict_list(tensor_dict_list):
    """Stack a list of (possibly nested) dicts of arrays along a new axis 0.

    Mirrors utils.py:124-141.
    """
    keys = tensor_dict_list[0].keys()
    out = {}
    for k in keys:
        example = tensor_dict_list[0][k]
        if isinstance(example, dict):
            out[k] = stack_tensor_dict_list([d[k] for d in tensor_dict_list])
        else:
            out[k] = np.stack([d[k] for d in tensor_dict_list], axis=0)
    return out


def set_seed(seed):
    """Seed python and numpy RNGs and return a root JAX PRNG key.

    The reference (utils.py:161-177) seeds random/numpy/TF globally; the
    JAX analog of the TF part is an explicit root key that the caller
    threads through the program (there is no global JAX RNG to seed).
    """
    seed = int(seed) % 4294967294
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)
