"""Algorithm tests: adaptation math, second-order gradients, full smoke.

Mirrors reference tests/test_optimizers.py (convergence) and
tests/test_integration.py (LR ~= 1 wiring sanity), plus grad-through-
adaptation checks the reference never had.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from promp_tpu.algos import DICEMAML, VPG_DICEMAML, ProMP, TRPOMAML, VPGMAML
from promp_tpu.algos.dice_maml import magic_box
from promp_tpu.envs import MetaPointEnvCorner, normalize
from promp_tpu.optimizers.adam import Adam
from promp_tpu.optimizers.trpo import (
    ConjugateGradientOptimizer, conjugate_gradients)
from promp_tpu.policies.gaussian_mlp import GaussianMLPPolicy
from promp_tpu.sampling.dice_processor import DiceSampleProcessor
from promp_tpu.sampling.processor import SampleProcessor
from promp_tpu.sampling.rollout import rollout
from promp_tpu.trainer import Trainer

N_TASKS, N_ENVS, T = 3, 4, 10


@pytest.fixture(scope="module")
def stack():
    env = normalize(MetaPointEnvCorner(reward_type="dense"))
    policy = GaussianMLPPolicy(obs_dim=2, action_dim=2, hidden_sizes=(16, 16))
    params = policy.init(jax.random.PRNGKey(0))
    tasks = env.sample_tasks(jax.random.PRNGKey(1), N_TASKS)
    task_params = policy.replicate(params, N_TASKS)
    traj = rollout(env, policy, task_params, tasks, jax.random.PRNGKey(2),
                   N_ENVS, T)
    proc = SampleProcessor(discount=0.99, normalize_adv=True)
    samples = proc.process(traj)
    samples.pop("stats")
    return env, policy, params, task_params, tasks, samples


class TestOptimizers:
    def test_adam_fits_sin_regression(self):
        """Reference test_optimizers.py:42-67 (MSE <= 0.02)."""
        policy = GaussianMLPPolicy(obs_dim=1, action_dim=1,
                                   hidden_sizes=(32, 32))
        params = policy.init(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        x = rng.uniform(-np.pi, np.pi, (500, 1)).astype(np.float32)
        y = np.sin(x)
        adam = Adam(learning_rate=1e-2)
        state = adam.init(params)

        @jax.jit
        def step(params, state):
            def loss_fn(p):
                pred = policy.apply(p, jnp.array(x))["mean"]
                return jnp.mean((pred - y) ** 2)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            params, state = adam.update(grads, state, params)
            return params, state, loss

        for _ in range(500):
            params, state, loss = step(params, state)
        assert float(loss) <= 0.02, float(loss)

    def test_conjugate_gradients_solves_spd_system(self):
        rng = np.random.RandomState(1)
        A = rng.randn(12, 12).astype(np.float32)
        A = A @ A.T + 0.5 * np.eye(12, dtype=np.float32)
        b = rng.randn(12).astype(np.float32)
        x = conjugate_gradients(lambda v: jnp.array(A) @ v, jnp.array(b),
                                cg_iters=12)
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                                   rtol=1e-2, atol=1e-3)

    def test_trpo_step_improves_quadratic_within_kl(self):
        """TRPO on a toy problem: loss must decrease, constraint must hold."""
        policy = GaussianMLPPolicy(obs_dim=3, action_dim=2,
                                   hidden_sizes=(8,))
        params = policy.init(jax.random.PRNGKey(3))
        target = jax.tree.map(
            lambda p: p + 0.5 * jax.random.normal(jax.random.PRNGKey(4),
                                                  p.shape), params)

        def loss_fn(p):
            return sum(jnp.sum((p[k] - target[k]) ** 2) for k in p)

        def kl_fn(p):
            return sum(jnp.sum((p[k] - params[k]) ** 2) for k in p)

        opt = ConjugateGradientOptimizer()
        new_params, info = opt.optimize(loss_fn, kl_fn, params, 0.01)
        assert float(info["loss"]) < float(info["loss_before"])
        assert float(kl_fn(new_params)) <= 0.0101
        assert bool(info["step_taken"])


class TestMagicBox:
    def test_value_is_one_gradient_is_cumulative(self):
        logp = jnp.array([[0.3, -0.2, 0.5]])
        np.testing.assert_allclose(np.asarray(magic_box(logp)),
                                   np.ones((1, 3)), rtol=1e-6)

        def f(logp):
            # sum_t magicbox_t * r_t with r = 1
            return jnp.sum(magic_box(logp))

        g = np.asarray(jax.grad(f)(logp))
        # d magicbox_t / d logp_s = 1{s <= t} at the evaluation point
        # so grad_s = number of t >= s
        np.testing.assert_allclose(g, [[3.0, 2.0, 1.0]], rtol=1e-5)


class TestAdaptation:
    def test_adapt_improves_inner_objective(self, stack):
        env, policy, params, task_params, tasks, samples = stack
        algo = ProMP(policy=policy, inner_lr=0.05)
        step_sizes = algo.init_step_sizes(params)
        adapted = algo.adapt(task_params, step_sizes, samples)
        data = algo._optimization_view(samples)
        for i in range(N_TASKS):
            d = jax.tree.map(lambda x: x[i], data)
            before = float(algo.inner_objective(
                jax.tree.map(lambda x: x[i], task_params), d, False))
            after = float(algo.inner_objective(
                jax.tree.map(lambda x: x[i], adapted), d, False))
            assert after < before

    def test_likelihood_ratio_one_at_sampling_params(self, stack):
        """Reference test_integration.py:128-175: with identical pre/post
        params the likelihood ratio is ~1 everywhere."""
        from promp_tpu.ops import distributions as dg
        env, policy, params, task_params, tasks, samples = stack
        dist = jax.vmap(lambda p, o: policy.apply(p, o, floor_std=True))(
            task_params, samples["observations"])
        lr = dg.likelihood_ratio(samples["actions"],
                                 samples["agent_infos"], dist)
        np.testing.assert_allclose(np.asarray(lr),
                                   np.ones((N_TASKS, N_ENVS, T)), rtol=1e-4)

    def test_second_order_gradients_flow(self, stack):
        """The outer gradient must include terms THROUGH the inner update:
        compare against a stop-gradient(inner-step) variant."""
        env, policy, params, task_params, tasks, samples = stack
        algo = ProMP(policy=policy, inner_lr=0.1, num_inner_grad_steps=1)
        step_sizes = algo.init_step_sizes(params)
        all_data = [samples, samples]
        hp = dict(inner_kl_coeff=jnp.zeros(1), clip_eps=jnp.float32(10.0))

        def loss(p):
            return algo.meta_objective(p, step_sizes, all_data,
                                       hp["inner_kl_coeff"],
                                       hp["clip_eps"])[0]

        def loss_fo(p):
            tp, _ = algo.unrolled_adaptation(p, step_sizes, all_data[:-1]
                                             + [all_data[-1]])
            tp = jax.lax.stop_gradient(tp)
            data = algo._optimization_view(all_data[-1])
            from promp_tpu.ops import distributions as dg

            def task_objective(pp, d):
                dist = policy.apply(pp, d["observations"], floor_std=False)
                lr = dg.likelihood_ratio(d["actions"], d["agent_infos"],
                                         dist)
                return -jnp.mean(lr * d["advantages"])
            return jnp.mean(jax.vmap(task_objective)(tp, data))

        g_full = jax.grad(loss)(params)
        g_fo = jax.grad(loss_fo)(params)
        diffs = [float(jnp.max(jnp.abs(g_full[k] - g_fo[k])))
                 for k in params]
        assert max(diffs) > 1e-6, "second-order terms are missing"


def _run_smoke(algo_cls, processor, n_itr=2, **algo_kwargs):
    env = normalize(MetaPointEnvCorner(reward_type="dense"))
    policy = GaussianMLPPolicy(obs_dim=2, action_dim=2, hidden_sizes=(8, 8))
    algo = algo_cls(policy=policy, num_inner_grad_steps=1, **algo_kwargs)
    trainer = Trainer(algo=algo, env=env, policy=policy,
                      sample_processor=processor, meta_batch_size=2,
                      rollouts_per_meta_task=2, max_path_length=8,
                      n_itr=n_itr, seed=0)
    state = trainer.train()
    flat = jnp.concatenate([jnp.ravel(v) for v in state["params"].values()])
    assert bool(jnp.all(jnp.isfinite(flat)))
    return state


class TestOuterKLGate:
    def test_limit_halts_epochs(self, stack):
        """outer_kl_limit=tiny must freeze the epoch scan after the first
        update (the gate sees KL > limit at epoch 2's start), so the
        result matches num_ppo_steps=1; limit=0 (off) must not."""
        env, policy, params, task_params, tasks, samples = stack
        all_data = [samples, samples]

        def run(**kw):
            algo = ProMP(policy=policy, inner_lr=0.05,
                         num_inner_grad_steps=1, num_ppo_steps=4,
                         learning_rate=0.05, adaptive_inner_kl_penalty=False,
                         init_inner_kl_penalty=0.0, **kw)
            ts = {"params": params, "step_sizes": algo.init_step_sizes(params)}
            os_ = algo.init_opt_state(ts)
            hp = {k: jnp.asarray(v) for k, v in algo.init_hparams().items()}
            ts, _os, metrics = algo.optimize_policy(ts, os_, all_data, hp)
            return ts

        # in this fixture round-2 samples come from the PRE-update policy,
        # so the outer KL is already > 0 at epoch 1: a tiny limit masks
        # EVERY epoch and the params must come back untouched
        gated = run(outer_kl_limit=1e-12)
        for k in params:
            np.testing.assert_array_equal(np.asarray(gated["params"][k]),
                                          np.asarray(params[k]))
        # a huge limit must reproduce the ungated path bit-for-bit
        free = run()
        loose = run(outer_kl_limit=1e9)
        for k in params:
            np.testing.assert_allclose(np.asarray(loose["params"][k]),
                                       np.asarray(free["params"][k]),
                                       rtol=1e-6, atol=1e-7)
        moved = max(float(jnp.max(jnp.abs(free["params"][k] - params[k])))
                    for k in params)
        assert moved > 1e-6


class TestAlgoSmoke:
    def test_promp(self):
        _run_smoke(ProMP, SampleProcessor(normalize_adv=True),
                   num_ppo_steps=2)

    def test_vpg_maml(self):
        _run_smoke(VPGMAML, SampleProcessor(normalize_adv=True))

    def test_vpg_maml_exploration(self):
        _run_smoke(VPGMAML, SampleProcessor(normalize_adv=True),
                   exploration=True)

    def test_trpo_maml(self):
        _run_smoke(TRPOMAML, SampleProcessor(normalize_adv=True))

    def test_trpo_maml_exploration(self):
        _run_smoke(TRPOMAML, SampleProcessor(normalize_adv=True),
                   exploration=True)

    def test_dice_maml(self):
        _run_smoke(DICEMAML, DiceSampleProcessor(max_path_length=8))

    def test_vpg_dice_maml(self):
        _run_smoke(VPG_DICEMAML,
                   DiceSampleProcessor(max_path_length=8,
                                       return_baseline="LinearFeatureBaseline"))

    def test_trainable_inner_step_size(self):
        """Trainable per-parameter inner step sizes (reference
        base.py:303-313 creates them as trainable variables): after
        optimization the step sizes must have MOVED away from inner_lr,
        learning stays finite, and with the flag off they stay fixed."""
        env = normalize(MetaPointEnvCorner(reward_type="dense"))

        def run(trainable):
            policy = GaussianMLPPolicy(obs_dim=2, action_dim=2,
                                       hidden_sizes=(8, 8))
            algo = ProMP(policy=policy, num_inner_grad_steps=1,
                         num_ppo_steps=2, inner_lr=0.1,
                         trainable_inner_step_size=trainable)
            trainer = Trainer(algo=algo, env=env, policy=policy,
                              sample_processor=SampleProcessor(
                                  normalize_adv=True),
                              meta_batch_size=2, rollouts_per_meta_task=2,
                              max_path_length=8, n_itr=2, seed=0)
            state = trainer.train()
            return state

        state = run(trainable=True)
        flat_params = jnp.concatenate(
            [jnp.ravel(v) for v in state["params"].values()])
        assert bool(jnp.all(jnp.isfinite(flat_params)))
        ss = jnp.concatenate([jnp.ravel(v)
                              for v in state["step_sizes"].values()])
        assert bool(jnp.all(jnp.isfinite(ss)))
        assert float(jnp.max(jnp.abs(ss - 0.1))) > 1e-6, \
            "trainable step sizes never moved"

        frozen = run(trainable=False)
        ss0 = jnp.concatenate([jnp.ravel(v)
                               for v in frozen["step_sizes"].values()])
        np.testing.assert_array_equal(np.asarray(ss0),
                                      np.full(ss0.shape, 0.1, np.float32))

    def test_trainable_step_size_respects_learn_std_mask(self):
        """mask_grads interplay: learn_std=False must keep log_std frozen
        even while step sizes train (reference gaussian_mlp_policy.py:66
        trainable iff learn_std; base.py:303-313)."""
        env = normalize(MetaPointEnvCorner(reward_type="dense"))
        policy = GaussianMLPPolicy(obs_dim=2, action_dim=2,
                                   hidden_sizes=(8, 8), learn_std=False)
        algo = ProMP(policy=policy, num_inner_grad_steps=1, num_ppo_steps=2,
                     trainable_inner_step_size=True)
        trainer = Trainer(algo=algo, env=env, policy=policy,
                          sample_processor=SampleProcessor(
                              normalize_adv=True),
                          meta_batch_size=2, rollouts_per_meta_task=2,
                          max_path_length=8, n_itr=2, seed=0)
        init_log_std = np.asarray(
            trainer.train_state["params"]["log_std_network/log_std_var"])
        state = trainer.train()
        np.testing.assert_array_equal(
            np.asarray(state["params"]["log_std_network/log_std_var"]),
            init_log_std)
