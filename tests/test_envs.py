"""Env suite contracts: registry completeness, shapes, reward semantics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from promp_tpu.envs import ENV_REGISTRY, make_env, normalize

# the reference's first-party env class names (SURVEY.md §2.7) that must
# resolve in our registry
REFERENCE_ENVS = [
    "MetaPointEnv", "MetaPointEnvCorner", "MetaPointEnvWalls",
    "MetaPointEnvMomentum", "HalfCheetahRandVelEnv",
    "HalfCheetahRandDirecEnv", "AntRandGoalEnv", "AntRandDirecEnv",
    "AntRandDirec2DEnv", "HumanoidRandDirecEnv", "HumanoidRandDirec2DEnv",
    "Walker2DRandVelEnv", "Walker2DRandDirecEnv", "SwimmerRandVelEnv",
    "SawyerPushEnv", "SawyerPushSimpleEnv", "SawyerDoorEnv",
    "SawyerPickAndPlaceEnv",
]

FAST_ENVS = ["MetaPointEnvCorner", "MetaPointEnv", "MetaPointEnvV2",
             "MetaPointEnvWalls", "MetaPointEnvMomentum", "SawyerPushEnv",
             "SawyerDoorEnv", "SawyerPickAndPlaceEnv"]


def test_registry_covers_reference_envs():
    missing = [n for n in REFERENCE_ENVS if n not in ENV_REGISTRY]
    assert not missing, missing


@pytest.mark.parametrize("name", FAST_ENVS)
def test_env_contract(name):
    env = make_env(name)
    tasks = env.sample_tasks(jax.random.PRNGKey(0), 3)
    task0 = jax.tree.map(lambda x: x[0], tasks)
    state, obs = env.reset(jax.random.PRNGKey(1), task0)
    assert obs.shape == (env.obs_dim,)

    @jax.jit
    def steps(state, key):
        def body(s, k):
            a = jnp.zeros(env.action_dim)
            s, o, r, d, info = env.step(s, a, task0, k)
            return s, (o, r, d)
        return jax.lax.scan(body, state,
                            jax.random.split(key, 5))

    _, (obss, rs, ds) = steps(state, jax.random.PRNGKey(2))
    assert obss.shape == (5, env.obs_dim)
    assert bool(jnp.all(jnp.isfinite(obss)))
    assert bool(jnp.all(jnp.isfinite(rs)))


class TestPointCornerSemantics:
    """Reward semantics of the default benchmark env
    (point_env_2d_corner.py:61-76)."""

    def setup_method(self):
        self.env = make_env("MetaPointEnvCorner")
        self.goal = jnp.array([2.0, 2.0])

    def _reward(self, state, action):
        _, _, r, _, _ = self.env.step(jnp.asarray(state), jnp.asarray(action),
                                      self.goal, jax.random.PRNGKey(0))
        return float(r)

    def test_zero_inside_radius(self):
        # L1 norm < 0.5 after the step -> reward 0
        assert self._reward([0.1, 0.1], [0.05, 0.05]) == 0.0

    def test_progress_when_goal_nearest(self):
        # near the goal corner, moving toward it yields positive progress
        prev = jnp.array([1.5, 1.5])
        r = self._reward(prev, [0.2, 0.2])
        expected = float(jnp.linalg.norm(prev - self.goal)
                         - jnp.linalg.norm(prev + 0.2 - self.goal))
        np.testing.assert_allclose(r, expected, rtol=1e-5)

    def test_zero_when_other_corner_nearest(self):
        # close to (-2,-2) while the goal is (2,2): no reward
        assert self._reward([-1.5, -1.5], [0.1, 0.1]) == 0.0

    def test_action_clipping(self):
        state = jnp.array([0.0, 0.0])
        new_state, obs, _, _, _ = self.env.step(
            state, jnp.array([5.0, -5.0]), self.goal, jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(obs), [0.2, -0.2], atol=1e-6)


class TestNormalizedEnv:
    def test_action_rescaling(self):
        env = normalize(make_env("MetaPointEnvCorner"))
        # policy-space action +10 maps to env upper bound 0.2
        state, _ = env.reset(jax.random.PRNGKey(0), jnp.array([2.0, 2.0]))
        new_state, obs, _, _, _ = env.step(
            state, jnp.array([10.0, -10.0]), jnp.array([2.0, 2.0]),
            jax.random.PRNGKey(1))
        delta = np.asarray(new_state) - np.asarray(state)
        np.testing.assert_allclose(delta, [0.2, -0.2], atol=1e-6)

    def test_obs_normalization_running_stats(self):
        env = normalize(make_env("MetaPointEnvCorner"), normalize_obs=True)
        task = jnp.array([2.0, 2.0])
        state, obs = env.reset(jax.random.PRNGKey(0), task)
        assert "obs_mean" in state
        state2, obs2, _, _, _ = env.step(state, jnp.zeros(2), task,
                                         jax.random.PRNGKey(1))
        assert not np.allclose(np.asarray(state2["obs_mean"]),
                               np.asarray(state["obs_mean"]))

    def test_ema_stats_persist_across_auto_resets(self):
        """The reference keeps _obs_mean/_obs_var as instance attrs that
        survive reset (normalized_env.py:37,91); the in-scan auto-reset
        must not wipe them (round-1 VERDICT weak #7)."""
        from dataclasses import dataclass

        from promp_tpu.envs.base import Box, TaskEnv
        from promp_tpu.policies.gaussian_mlp import GaussianMLPPolicy
        from promp_tpu.sampling.rollout import rollout

        @dataclass(frozen=True)
        class EveryThirdStepDone(TaskEnv):
            """Deterministic drifting obs; done every 3rd step."""
            observation_space: Box = Box(-np.inf, np.inf, (2,))
            action_space: Box = Box(-1.0, 1.0, (2,))

            def sample_tasks(self, key, n):
                return jnp.zeros((n, 0))

            def reset(self, key, task):
                s = {"x": jnp.ones(2), "t": jnp.zeros((), jnp.int32)}
                return s, s["x"]

            def step(self, state, action, task, key):
                x = state["x"] + 1.0
                t = state["t"] + 1
                done = (t % 3) == 0
                return ({"x": x, "t": t}, x, jnp.sum(x), done, {})

        env = normalize(EveryThirdStepDone(), normalize_obs=True)
        policy = GaussianMLPPolicy(obs_dim=2, action_dim=2,
                                   hidden_sizes=(4,))
        params = policy.replicate(policy.init(jax.random.PRNGKey(0)), 1)
        tasks = jnp.zeros((1, 0))
        traj = rollout(env, policy, params, tasks, jax.random.PRNGKey(1),
                       n_envs=1, horizon=10)
        # obs stream is positive-drifting; with persistence the EMA mean
        # (reconstructable from normalized obs vs raw) keeps growing. We
        # can't see state directly, but normalized obs of a constant-drift
        # signal under a persistent EMA stays positive and bounded; a wiped
        # EMA would renormalize against mean=0 var=1 at each segment start,
        # making the post-reset normalized obs jump back to the raw scale.
        obs = np.asarray(traj["observations"])[0, 0]  # (T, 2)
        dones = np.asarray(traj["dones"])[0, 0]
        starts = np.where(np.roll(dones, 1))[0]
        starts = starts[starts > 0]
        assert len(starts) >= 2
        # raw obs at a segment start is 1.0; with a wiped EMA the
        # normalized value would be ~(1 - a*1)/(sqrt(1) ) ~= 1.0 every time;
        # with persistence the accumulated mean shifts it progressively
        vals = obs[starts, 0]
        assert not np.allclose(vals, vals[0], atol=1e-4), vals


class TestRandParams:
    def test_multiplier_ranges(self):
        env = make_env("HalfCheetahRandParamsEnv", log_scale_limit=1.0)
        tasks = env.sample_tasks(jax.random.PRNGKey(0), 50)
        bm = np.asarray(tasks["body_mass"])
        assert bm.min() >= 1.5 ** -1.0 - 1e-5
        assert bm.max() <= 1.5 ** 1.0 + 1e-5
        dd = np.asarray(tasks["dof_damping"])
        assert dd.min() >= 1.3 ** -1.0 - 1e-5
        assert dd.max() <= 1.3 ** 1.0 + 1e-5


class TestSawyerMechanics:
    """The engine-backed manipulation scenes: pushing, door opening and
    grasping happen through real contact forces (pair contacts,
    engine._pair_terms), not kinematic teleports."""

    @staticmethod
    def _drive(env, state, task, n, act_fn):
        key = jax.random.PRNGKey(0)
        step = jax.jit(lambda s, a: env.step(s, a, task, key))
        for _ in range(n):
            state, obs, r, d, info = step(state, act_fn(state))
        return state, info

    def test_push_moves_puck_by_contact(self):
        env = make_env("SawyerPushEnv")
        task = env.sample_tasks(jax.random.PRNGKey(0), 1)[0]
        state, _ = env.reset(jax.random.PRNGKey(1), task)
        start = np.asarray(state["q"][3:6])
        state, info = self._drive(
            env, state, task, 100,
            lambda s: jnp.clip(8 * (s["q"][3:6] - s["q"][:3]), -1, 1))
        moved = np.linalg.norm(np.asarray(state["q"][3:5]) - start[:2])
        assert moved > 0.05, moved
        assert bool(jnp.all(jnp.isfinite(state["q"])))

    def test_door_opens_only_through_handle_push(self):
        env = make_env("SawyerDoorEnv")
        task = env.sample_tasks(jax.random.PRNGKey(0), 1)[0]
        state, _ = env.reset(jax.random.PRNGKey(1), task)
        # idle EE: door stays closed
        idle, _ = self._drive(env, state, task, 50,
                              lambda s: jnp.zeros(3))
        assert abs(float(idle["q"][3])) < 0.02
        # approach from the +y side and sweep toward -y: door opens
        state, _ = self._drive(
            env, state, task, 60,
            lambda s: jnp.clip(8 * (jnp.array([-0.05, 0.78, 0.1])
                                    - s["q"][:3]), -1, 1))
        state, _ = self._drive(
            env, state, task, 150,
            lambda s: jnp.clip(
                8 * (env._handle(s["q"][3]) + jnp.array([0.0, 0.02, 0.0])
                     - s["q"][:3]) + jnp.array([0.0, -0.6, 0.0]), -1, 1))
        assert float(state["q"][3]) > 0.5

    def test_grasp_carries_and_release_drops(self):
        env = make_env("SawyerPickAndPlaceEnv")
        task = env.sample_tasks(jax.random.PRNGKey(0), 1)[0]
        state, _ = env.reset(jax.random.PRNGKey(1), task)
        # reach the object with the gripper closed
        state, _ = self._drive(
            env, state, task, 80,
            lambda s: jnp.clip(jnp.concatenate(
                [8 * (s["q"][3:6] - s["q"][:3]), jnp.ones(1)]), -1, 1))
        assert float(state["grasp"]) == 1.0
        # lift: object tracks the EE upward
        state, _ = self._drive(
            env, state, task, 60,
            lambda s: jnp.array([0.0, 0.0, 1.0, 1.0]))
        assert float(state["q"][5]) > 0.12
        # open the gripper: object falls back to the table by gravity
        state, _ = self._drive(
            env, state, task, 60,
            lambda s: jnp.array([0.0, 0.0, 0.0, -1.0]))
        assert float(state["grasp"]) == 0.0
        assert float(state["q"][5]) < 0.06
