"""Pallas rollout megakernel: bitwise equivalence vs a plain-JAX replay.

Runs the kernel in TPU-interpret mode on CPU; on real TPU the same code
compiles natively (bench path).
"""
import numpy as np

import jax
import jax.numpy as jnp

from promp_tpu.envs import MetaPointEnvCorner, normalize
from promp_tpu.ops.pallas_rollout import pallas_pointmass_rollout
from promp_tpu.policies.gaussian_mlp import GaussianMLPPolicy
from promp_tpu.sampling.rollout import rollout

N_T, N_E, T = 3, 8, 25


def _setup():
    env = normalize(MetaPointEnvCorner())
    policy = GaussianMLPPolicy(obs_dim=2, action_dim=2,
                               hidden_sizes=(64, 64))
    params = policy.init(jax.random.PRNGKey(0))
    goals = env.sample_tasks(jax.random.PRNGKey(1), N_T)
    tp = policy.replicate(params, N_T)
    obs0 = jax.random.uniform(jax.random.PRNGKey(2), (N_T, N_E, 2),
                              jnp.float32, -0.2, 0.2)
    return env, policy, tp, goals, obs0


def _replay(policy, tp, goals, obs0, noise):
    """Plain-JAX execution of the exact same math the kernel runs."""
    def task_roll(p, goal, o0, nz):
        def body(obs, n):
            dist = policy.apply(p, obs, floor_std=True)
            act = dist["mean"] + n * jnp.exp(dist["log_std"])
            scaled = jnp.clip(-0.2 + (act + 10.0) * 0.4 / 20.0, -0.2, 0.2)
            new = obs + scaled
            # formulation mirrors the kernel op-for-op so float ties agree
            goal_d = jnp.sqrt(jnp.sum((new - goal) ** 2, axis=-1))
            x, y = new[:, 0], new[:, 1]
            d2 = jnp.minimum(
                jnp.minimum((x + 2.0) ** 2 + (y + 2.0) ** 2,
                            (x - 2.0) ** 2 + (y + 2.0) ** 2),
                jnp.minimum((x + 2.0) ** 2 + (y - 2.0) ** 2,
                            (x - 2.0) ** 2 + (y - 2.0) ** 2))
            prev_d = jnp.sqrt(jnp.sum((obs - goal) ** 2, axis=-1))
            rew = jnp.where(jnp.sum(jnp.abs(new), -1) < 0.5, 0.0,
                            jnp.where(goal_d <= jnp.sqrt(d2) + 1e-7,
                                      prev_d - goal_d, 0.0))
            return new, (obs, act, rew)
        _, (os_, as_, rs_) = jax.lax.scan(body, o0, nz)
        return os_, as_, rs_

    os_, as_, rs_ = jax.vmap(task_roll)(tp, goals, obs0, noise)
    swap = lambda x: jnp.swapaxes(x, 1, 2)
    return swap(os_), swap(as_), swap(rs_)


class TestPallasRollout:
    def test_bitwise_vs_replay(self):
        env, policy, tp, goals, obs0 = _setup()
        key = jax.random.PRNGKey(9)
        out = pallas_pointmass_rollout(tp, goals, obs0, key, horizon=T,
                                       interpret=True)
        noise = jax.random.normal(key, (N_T, T, N_E, 2), jnp.float32)
        obs_r, act_r, rew_r = _replay(policy, tp, goals, obs0, noise)
        np.testing.assert_array_equal(np.asarray(out["observations"]),
                                      np.asarray(obs_r))
        np.testing.assert_array_equal(np.asarray(out["actions"]),
                                      np.asarray(act_r))
        np.testing.assert_allclose(np.asarray(out["rewards"]),
                                   np.asarray(rew_r), atol=1e-6)

    def test_statistics_match_engine(self):
        """The kernel's trajectories are distributed like the standard
        rollout engine's (different RNG streams)."""
        env, policy, tp, goals, obs0 = _setup()
        out = pallas_pointmass_rollout(tp, goals, obs0,
                                       jax.random.PRNGKey(4), horizon=T,
                                       interpret=True)
        ref = rollout(env, policy, tp, goals, jax.random.PRNGKey(5),
                      N_E, T)
        a, b = np.asarray(out["actions"]), np.asarray(ref["actions"])
        assert abs(a.std() - b.std()) < 0.1
        assert abs(a.mean() - b.mean()) < 0.1
        oa, ob = (np.asarray(out["observations"]),
                  np.asarray(ref["observations"]))
        assert abs(oa.std() - ob.std()) < 0.1


class TestPallasBackendInTrainer:
    """The megakernel as a product-path rollout backend (Trainer opt-in)."""

    def _trainer(self, env, **kw):
        from promp_tpu.algos import ProMP
        from promp_tpu.sampling.processor import SampleProcessor
        from promp_tpu.trainer import Trainer
        policy = GaussianMLPPolicy(obs_dim=2, action_dim=2,
                                   hidden_sizes=(64, 64))
        algo = ProMP(policy=policy, num_inner_grad_steps=1, num_ppo_steps=1,
                     adaptive_inner_kl_penalty=False)
        return Trainer(algo=algo, env=env, policy=policy,
                       sample_processor=SampleProcessor(normalize_adv=True),
                       meta_batch_size=2, rollouts_per_meta_task=2,
                       max_path_length=8, n_itr=1, seed=0, **kw)

    def test_trains_end_to_end(self):
        env = normalize(MetaPointEnvCorner())  # sparse: kernel-supported
        trainer = self._trainer(env, rollout_backend="pallas")
        state = trainer.train()
        flat = jnp.concatenate([jnp.ravel(v)
                                for v in state["params"].values()])
        assert bool(jnp.all(jnp.isfinite(flat)))

    def test_falls_back_on_unsupported_env(self):
        env = normalize(MetaPointEnvCorner(reward_type="dense"))
        trainer = self._trainer(env, rollout_backend="pallas")
        state = trainer.train()  # runs on the scan engine
        flat = jnp.concatenate([jnp.ravel(v)
                                for v in state["params"].values()])
        assert bool(jnp.all(jnp.isfinite(flat)))
