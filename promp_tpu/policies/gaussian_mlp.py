"""Functional diagonal-Gaussian MLP policy.

TPU-native analog of the reference's policy stack (reference:
meta_policy_search/policies/gaussian_mlp_policy.py,
meta_policy_search/policies/networks/mlp.py, policies/base.py:218-287
``MetaPolicy``). The reference keeps the pre-update policy in tf.Variables
and builds ``meta_batch_size`` placeholder-fed clones for the post-update
policies; here the policy is a single pure ``apply(params, obs)`` function
and the "per-task policies" are simply a params pytree with a leading task
axis, mapped with ``jax.vmap``. That turns the reference's O(tasks) graph
replication (SURVEY.md §3.6) into one constant-size XLA program.

Parameter naming matches the reference variable names
(``mean_network/hidden_%d/{kernel,bias}``, ``mean_network/output/...``,
``log_std_network/log_std_var``) so checkpoints and tests line up 1:1.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

NONLINEARITIES = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "elu": jax.nn.elu,
    "identity": lambda x: x,
    None: lambda x: x,
}


@dataclass(frozen=True)
class GaussianMLPPolicy:
    """Static policy configuration; parameters live in an external pytree.

    Defaults mirror the reference (policies/base.py:26-33 tanh hidden /
    linear output, gaussian_mlp_policy.py:31 init_std=1, min_std=1e-6).
    """

    obs_dim: int
    action_dim: int
    hidden_sizes: Tuple[int, ...] = (64, 64)
    learn_std: bool = True
    init_std: float = 1.0
    min_std: float = 1e-6
    # nonlinearities are referenced by NAME so policy configs pickle cleanly
    # (the reference pickles policies via Serializable ctor capture,
    # policies/base.py:205-215)
    hidden_nonlinearity: str = "tanh"
    output_nonlinearity: Optional[str] = None
    # On TPU the default f32 matmul runs at bf16 precision; this MLP is far
    # too small for that to matter for speed (the MXU is bound by the env
    # scan), so default to full f32 for cross-platform numerical parity.
    precision: str = "highest"

    @property
    def min_log_std(self):
        return math.log(self.min_std)

    @property
    def init_log_std(self):
        return math.log(self.init_std)

    # ------------------------------------------------------------------ init
    def init(self, key):
        """Xavier(glorot-uniform) kernels, zero biases, constant log_std.

        Mirrors networks/mlp.py:12 (xavier init) and
        gaussian_mlp_policy.py:63-69 (log_std variable of shape
        (1, action_dim) initialized to log(init_std)).
        """
        sizes = (self.obs_dim,) + tuple(self.hidden_sizes) + (self.action_dim,)
        params = {}
        n_layers = len(sizes) - 1
        keys = jax.random.split(key, n_layers)
        init_fn = jax.nn.initializers.glorot_uniform()
        for i in range(n_layers):
            name = "output" if i == n_layers - 1 else f"hidden_{i}"
            params[f"mean_network/{name}/kernel"] = init_fn(
                keys[i], (sizes[i], sizes[i + 1]), jnp.float32)
            params[f"mean_network/{name}/bias"] = jnp.zeros(
                (sizes[i + 1],), jnp.float32)
        params["log_std_network/log_std_var"] = jnp.full(
            (1, self.action_dim), self.init_log_std, jnp.float32)
        return params

    # ----------------------------------------------------------------- apply
    def apply(self, params, obs, floor_std=True):
        """Forward pass -> dist_info dict {"mean", "log_std"}.

        ``floor_std=True`` applies the min-log-std floor, matching the
        reference's *variable* read path (gaussian_mlp_policy.py:71); the
        functional path through inner-adapted params uses the raw value
        (gaussian_mlp_policy.py:164-184), i.e. ``floor_std=False``.
        """
        x = obs
        hidden_fn = NONLINEARITIES[self.hidden_nonlinearity]
        out_fn = NONLINEARITIES[self.output_nonlinearity]
        n_hidden = len(self.hidden_sizes)
        for i in range(n_hidden):
            w = params[f"mean_network/hidden_{i}/kernel"]
            b = params[f"mean_network/hidden_{i}/bias"]
            x = hidden_fn(jnp.dot(x, w, precision=self.precision) + b)
        w = params["mean_network/output/kernel"]
        b = params["mean_network/output/bias"]
        mean = out_fn(jnp.dot(x, w, precision=self.precision) + b)
        log_std = params["log_std_network/log_std_var"][0]
        # floor_std may be a Python bool OR a traced bool — jnp.where keeps
        # the pre/post-update variants in ONE compiled program
        log_std = jnp.where(floor_std,
                            jnp.maximum(log_std, self.min_log_std), log_std)
        log_std = jnp.broadcast_to(log_std, mean.shape)
        return {"mean": mean, "log_std": log_std}

    def act(self, params, obs, key, floor_std=True):
        """Sample an action; returns (action, dist_info).

        The reference samples action noise on the host with numpy
        (gaussian_mlp_policy.py:110-116); here it's a counter-based
        ``jax.random.normal`` fused into the rollout scan.
        """
        dist_info = self.apply(params, obs, floor_std=floor_std)
        noise = jax.random.normal(key, dist_info["mean"].shape,
                                  dist_info["mean"].dtype)
        action = dist_info["mean"] + noise * jnp.exp(dist_info["log_std"])
        return action, dist_info

    # ------------------------------------------------------------- utilities
    def trainable_keys(self, params):
        """Keys updated by inner/outer optimization.

        When ``learn_std`` is False the log_std variable is excluded, like
        the non-trainable tf.Variable in gaussian_mlp_policy.py:63-69.
        """
        keys = list(params.keys())
        if not self.learn_std:
            keys = [k for k in keys if not k.startswith("log_std_network")]
        return keys

    def replicate(self, params, n_tasks):
        """Tile params with a leading task axis.

        Analog of ``MetaPolicy.switch_to_pre_update`` replicating current
        values meta_batch_size times (policies/base.py:234-240).
        """
        return jax.tree.map(
            lambda p: jnp.broadcast_to(p, (n_tasks,) + p.shape), params)


def flatten_params(params):
    """Concatenate a params pytree into one flat vector (with treedef).

    Analog of conjugate_gradient_optimizer.py:310-322 flatten/unflatten,
    used by the TRPO machinery.
    """
    leaves, treedef = jax.tree.flatten(params)
    shapes = [l.shape for l in leaves]
    flat = jnp.concatenate([l.reshape(-1) for l in leaves])
    return flat, (treedef, shapes)


def unflatten_params(flat, spec):
    treedef, shapes = spec
    leaves = []
    idx = 0
    for shape in shapes:
        size = 1
        for s in shape:
            size *= s
        leaves.append(flat[idx:idx + size].reshape(shape))
        idx += size
    return jax.tree.unflatten(treedef, leaves)
