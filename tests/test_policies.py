"""Policy tests mirroring reference tests/test_policies.py:

  * symbolic dist == sampling-path outputs (:43-64)
  * per-task (vmapped) apply consistency (:66-83)
  * param get/set round-trip (:85-98)
  * serialization round-trip -> identical outputs (:100-120)
"""
import pickle

import numpy as np

import jax
import jax.numpy as jnp

from promp_tpu.policies.gaussian_mlp import (
    GaussianMLPPolicy, flatten_params, unflatten_params)


def make_policy(obs_dim=23, action_dim=7):
    return GaussianMLPPolicy(obs_dim=obs_dim, action_dim=action_dim,
                             hidden_sizes=(64, 64))


class TestGaussianMLPPolicy:
    def setup_method(self):
        self.policy = make_policy()
        self.params = self.policy.init(jax.random.PRNGKey(42))
        rng = np.random.RandomState(0)
        self.obs = rng.randn(10, 23).astype(np.float32)

    def test_param_shapes_and_names(self):
        p = self.params
        assert p["mean_network/hidden_0/kernel"].shape == (23, 64)
        assert p["mean_network/hidden_1/kernel"].shape == (64, 64)
        assert p["mean_network/output/kernel"].shape == (64, 7)
        assert p["mean_network/output/bias"].shape == (7,)
        assert p["log_std_network/log_std_var"].shape == (1, 7)
        np.testing.assert_allclose(p["log_std_network/log_std_var"], 0.0)

    def test_apply_matches_manual_forward(self):
        dist = self.policy.apply(self.params, jnp.array(self.obs))
        x = self.obs
        x = np.tanh(x @ np.asarray(self.params["mean_network/hidden_0/kernel"])
                    + np.asarray(self.params["mean_network/hidden_0/bias"]))
        x = np.tanh(x @ np.asarray(self.params["mean_network/hidden_1/kernel"])
                    + np.asarray(self.params["mean_network/hidden_1/bias"]))
        mean = (x @ np.asarray(self.params["mean_network/output/kernel"])
                + np.asarray(self.params["mean_network/output/bias"]))
        np.testing.assert_allclose(dist["mean"], mean, rtol=1e-4, atol=1e-5)
        assert dist["log_std"].shape == mean.shape

    def test_act_uses_dist(self):
        action, dist = self.policy.act(self.params, jnp.array(self.obs),
                                       jax.random.PRNGKey(1))
        assert action.shape == (10, 7)
        # with log_std = 0, action = mean + unit noise
        resid = np.asarray(action) - np.asarray(dist["mean"])
        assert 0.5 < np.std(resid) < 1.5

    def test_min_log_std_floor(self):
        params = dict(self.params)
        params["log_std_network/log_std_var"] = jnp.full((1, 7), -100.0)
        floored = self.policy.apply(params, jnp.array(self.obs),
                                    floor_std=True)
        raw = self.policy.apply(params, jnp.array(self.obs), floor_std=False)
        np.testing.assert_allclose(floored["log_std"],
                                   np.log(1e-6), rtol=1e-5)
        np.testing.assert_allclose(raw["log_std"], -100.0, rtol=1e-5)

    def test_vmapped_per_task_apply_matches_loop(self):
        n_tasks = 5
        task_params = self.policy.replicate(self.params, n_tasks)
        # perturb each task's params differently
        scale = 1 + 0.01 * jnp.arange(n_tasks, dtype=jnp.float32)
        task_params = jax.tree.map(
            lambda p: p * scale.reshape((n_tasks,) + (1,) * (p.ndim - 1)),
            task_params)
        obs = jnp.array(np.random.RandomState(1).randn(n_tasks, 4, 23),
                        jnp.float32)
        batched = jax.vmap(self.policy.apply)(task_params, obs)
        for i in range(n_tasks):
            single = self.policy.apply(
                jax.tree.map(lambda p: p[i], task_params), obs[i])
            np.testing.assert_allclose(batched["mean"][i], single["mean"],
                                       rtol=1e-5, atol=1e-6)

    def test_flatten_unflatten_roundtrip(self):
        flat, spec = flatten_params(self.params)
        restored = unflatten_params(flat, spec)
        for k in self.params:
            np.testing.assert_array_equal(self.params[k], restored[k])

    def test_pickle_roundtrip_identical_outputs(self):
        # reference tests/test_policies.py:100-120
        blob = pickle.dumps((self.policy, jax.device_get(self.params)))
        policy2, params2 = pickle.loads(blob)
        d1 = self.policy.apply(self.params, jnp.array(self.obs))
        d2 = policy2.apply(jax.device_put(params2), jnp.array(self.obs))
        np.testing.assert_allclose(d1["mean"], d2["mean"], rtol=1e-6)
        np.testing.assert_allclose(d1["log_std"], d2["log_std"], rtol=1e-6)

    def test_trainable_keys_respects_learn_std(self):
        assert "log_std_network/log_std_var" in self.policy.trainable_keys(
            self.params)
        frozen = GaussianMLPPolicy(obs_dim=23, action_dim=7, learn_std=False)
        assert "log_std_network/log_std_var" not in frozen.trainable_keys(
            self.params)
