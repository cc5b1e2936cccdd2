"""End-to-end seed-exact parity oracle (BASELINE.md item 1, VERDICT #4).

The TF1 reference cannot run in this container, so its pipeline semantics
are encoded in an INDEPENDENT float64 implementation — numpy for the env
transitions and sample processing, torch.autograd for the differentiable
inner/outer steps (with tf.train.AdamOptimizer's update formula hand-coded)
— and our JAX pipeline, run in float64, must reproduce it over TWO full
ProMP meta-iterations:

  * trajectories: the compat sampler replays the reference's np.random
    MT19937 consumption order (set_seed utils.py:161-177; tasks via
    np.random.choice point_env_2d_corner.py:86-87; resets :50; per-step
    numpy action noise gaussian_mlp_policy.py:112-113); the oracle
    recomputes every env transition + reward from the sampled actions in
    independent float64 numpy -> equal to ~2 ulp (branch decisions exact).
  * processing: discount_cumsum returns (utils.py:74-81), linear feature
    baseline via regularized normal-equations lstsq
    (linear_baseline.py:55-77, 101-106), GAE (samplers/base.py:151-162),
    per-task advantage normalization (utils.py:59-63) -> <= 1e-10.
  * inner adaptation theta' = theta - alpha (.) grad(-E[LR*A])
    (meta_algos/base.py:192-215, pro_mp.py:59-65) -> <= 1e-7.
  * ProMP outer: second-order meta-gradient through the unrolled inner
    step of the clipped surrogate + inner-KL penalty (pro_mp.py:124-155),
    multi-epoch full-batch Adam with persistent slots
    (maml_first_order_optimizer.py:82-115) -> parameters <= 1e-6 after two
    meta-iterations.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from promp_tpu.algos import ProMP
from promp_tpu.policies.gaussian_mlp import GaussianMLPPolicy
from promp_tpu.sampling.compat_sampler import CompatPointMassSampler
from promp_tpu.sampling.processor import SampleProcessor

META_BS, N_ENVS, T = 4, 3, 20
HIDDEN = (32, 32)
INNER_LR = 0.1
LR = 1e-3
PPO_STEPS = 3
CLIP_EPS = 0.3
KL_COEFF = 5e-4
GAMMA, LAM = 0.99, 1.0
CORNERS = np.array([[-2.0, -2.0], [2.0, -2.0], [-2.0, 2.0], [2.0, 2.0]])


# ------------------------------------------------------------ numpy oracle
def oracle_rewards(observations, actions, goal):
    """Independent recompute of the env chain: NormalizedEnv action affine
    (normalized_env.py:109-117) -> clip(+-0.2) step + sparse corner reward
    (point_env_2d_corner.py:39-76)."""
    n_e, T_, _ = actions.shape
    rewards = np.zeros((n_e, T_))
    for e in range(n_e):
        for t in range(T_):
            prev = observations[e, t]
            scaled = -0.2 + (actions[e, t] + 10.0) * 0.4 / 20.0
            new = prev + np.clip(np.clip(scaled, -0.2, 0.2), -0.2, 0.2)
            if np.linalg.norm(new, ord=1) < 0.5:
                rewards[e, t] = 0.0
            else:
                # the goal distance and the per-corner distances MUST use
                # the same norm form (axis-reduction), exactly as the
                # reference env does (point_env_2d_corner.py:63,72) — the
                # dot-based np.linalg.norm(vec) rounds differently by
                # 1 ulp, which flips the == tie test at the goal corner
                dists = np.linalg.norm(new[None] - CORNERS, axis=-1)
                gd = np.linalg.norm(new[None] - np.asarray(goal)[None],
                                    axis=-1)[0]
                if gd == dists.min():
                    rewards[e, t] = np.linalg.norm(
                        prev[None] - np.asarray(goal)[None], axis=-1)[0] - gd
                else:
                    rewards[e, t] = 0.0
    return rewards


def discount_cumsum(x, gamma):
    """utils.py:74-81 (reverse scan form of scipy.signal.lfilter)."""
    out = np.zeros_like(x)
    run = 0.0
    for t in reversed(range(x.shape[-1])):
        run = x[..., t] + gamma * run
        out[..., t] = run
    return out


def oracle_process(obs, rewards):
    """One task: returns, baseline, GAE, normalized advantages.

    obs (n_e, T, 2), rewards (n_e, T). Mirrors samplers/base.py:99-133 +
    linear_baseline.py:55-106 (features on clipped obs + time powers; fit
    on the regularized normal equations with np.linalg.lstsq).
    """
    returns = np.stack([discount_cumsum(rewards[e], GAMMA)
                        for e in range(rewards.shape[0])])
    # features per path (linear_baseline.py:101-106)
    feats = []
    for e in range(obs.shape[0]):
        o = np.clip(obs[e], -10, 10)
        al = np.arange(obs.shape[1]).reshape(-1, 1) / 100.0
        feats.append(np.concatenate(
            [o, o**2, al, al**2, al**3, np.ones_like(al)], axis=1))
    featmat = np.concatenate(feats)
    target = returns.reshape(-1)
    reg = 1e-5
    coeffs = np.linalg.lstsq(
        featmat.T.dot(featmat) + reg * np.identity(featmat.shape[1]),
        featmat.T.dot(target), rcond=-1)[0]
    baselines = np.stack([f.dot(coeffs) for f in feats])
    advantages = np.zeros_like(rewards)
    for e in range(rewards.shape[0]):
        pb = np.append(baselines[e], 0.0)
        deltas = rewards[e] + GAMMA * pb[1:] - pb[:-1]
        advantages[e] = discount_cumsum(deltas, GAMMA * LAM)
    # per-task normalization (utils.py:59-63)
    advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
    return returns, advantages


# ------------------------------------------------------------- torch oracle
def torch_params(params):
    return {k: torch.tensor(np.asarray(v, np.float64), requires_grad=True)
            for k, v in params.items()}


def torch_forward(p, obs, floor_std, n_hidden=2):
    x = obs
    for i in range(n_hidden):
        x = torch.tanh(x @ p[f"mean_network/hidden_{i}/kernel"]
                       + p[f"mean_network/hidden_{i}/bias"])
    mean = x @ p["mean_network/output/kernel"] + p["mean_network/output/bias"]
    log_std = p["log_std_network/log_std_var"][0]
    if floor_std:
        log_std = torch.clamp(log_std, min=np.log(1e-6))
    return mean, log_std.expand_as(mean)


def torch_loglik(a, mean, log_std):
    """diagonal_gaussian.py:89-109."""
    zs = (a - mean) / torch.exp(log_std)
    return (-log_std.sum(-1) - 0.5 * (zs**2).sum(-1)
            - 0.5 * a.shape[-1] * np.log(2 * np.pi))


def torch_kl(old_mean, old_log_std, mean, log_std):
    """diagonal_gaussian.py:16-44 (incl. the 1e-8 denominator)."""
    num = ((old_mean - mean)**2 + torch.exp(old_log_std)**2
           - torch.exp(log_std)**2)
    den = 2.0 * torch.exp(log_std)**2 + 1e-8
    return (num / den + log_std - old_log_std).sum(-1)


def torch_inner_loss(p, data, floor_std):
    """-E[LR * A] (pro_mp.py:59-65)."""
    mean, log_std = torch_forward(p, data["obs"], floor_std)
    lr = torch.exp(torch_loglik(data["act"], mean, log_std)
                   - data["old_loglik"])
    return -(lr * data["adv"]).mean()


def torch_adapt(p, data, floor_std, create_graph):
    """theta' = theta - alpha * grad (meta_algos/base.py:192-215)."""
    loss = torch_inner_loss(p, data, floor_std)
    keys = list(p.keys())
    grads = torch.autograd.grad(loss, [p[k] for k in keys],
                                create_graph=create_graph)
    return {k: p[k] - INNER_LR * g for k, g in zip(keys, grads)}


def torch_meta_loss(p, round0, round1):
    """Unrolled clipped surrogate + inner-KL penalty (pro_mp.py:67-155)."""
    surr_objs, inner_kls = [], []
    for i in range(META_BS):
        d0 = round0[i]
        # step-0 dist: variable path (floored), pro_mp.py:89-92
        mean0, log_std0 = torch_forward(p, d0["obs"], floor_std=True)
        kl0 = torch_kl(d0["old_mean"], d0["old_log_std"],
                       mean0, log_std0).mean()
        inner_kls.append(kl0)
        adapted = torch_adapt(p, d0, floor_std=True, create_graph=True)
        d1 = round1[i]
        mean1, log_std1 = torch_forward(adapted, d1["obs"], floor_std=False)
        lr = torch.exp(torch_loglik(d1["act"], mean1, log_std1)
                       - d1["old_loglik"])
        clipped = torch.minimum(
            lr * d1["adv"],
            torch.clamp(lr, 1 - CLIP_EPS, 1 + CLIP_EPS) * d1["adv"])
        surr_objs.append(-clipped.mean())
    mean_inner_kl = torch.stack(inner_kls).mean()
    return (torch.stack(surr_objs).mean()
            + (KL_COEFF * mean_inner_kl))


class TF1Adam:
    """tf.train.AdamOptimizer semantics (lr_t = lr sqrt(1-b2^t)/(1-b1^t);
    eps added OUTSIDE the bias-corrected sqrt), slots persistent across
    optimize calls (maml_first_order_optimizer.py:82-115)."""

    def __init__(self, keys, lr=LR, b1=0.9, b2=0.999, eps=1e-8):
        self.m = {k: 0.0 for k in keys}
        self.v = {k: 0.0 for k in keys}
        self.t = 0
        self.lr, self.b1, self.b2, self.eps = lr, b1, b2, eps

    def step(self, p, grads):
        self.t += 1
        lr_t = self.lr * np.sqrt(1 - self.b2**self.t) / (1 - self.b1**self.t)
        new = {}
        for k in p:
            g = grads[k]
            self.m[k] = self.b1 * self.m[k] + (1 - self.b1) * g
            self.v[k] = self.b2 * self.v[k] + (1 - self.b2) * g * g
            new[k] = (p[k].detach()
                      - lr_t * self.m[k] / (torch.sqrt(self.v[k]) + self.eps)
                      ).requires_grad_(True)
        return new


def to_task_views(paths, processed_adv):
    """Per-task torch data dicts from compat-sampled paths."""
    views = []
    for i, path in enumerate(paths):
        obs = torch.tensor(path["observations"].reshape(-1, 2))
        act = torch.tensor(path["actions"].reshape(-1, 2))
        old_mean = torch.tensor(path["agent_infos"]["mean"].reshape(-1, 2))
        old_log_std = torch.tensor(
            path["agent_infos"]["log_std"].reshape(-1, 2))
        old_loglik = torch_loglik(act, old_mean, old_log_std).detach()
        views.append(dict(obs=obs, act=act, old_mean=old_mean,
                          old_log_std=old_log_std, old_loglik=old_loglik,
                          adv=torch.tensor(processed_adv[i].reshape(-1))))
    return views


@pytest.mark.filterwarnings("ignore")
@pytest.mark.parametrize("bias", [0.0, 3.0])
def test_two_meta_iterations_match_oracle(bias):
    # bias=0: the xavier init keeps every trajectory inside the corner
    # env's L1<0.5 dead zone -> all advantages are ZERO, the surrogate
    # branch is trivial, but the inner-KL-penalty + Adam path is pinned
    # at the tightest tolerances. bias=3: trajectories cross into the
    # rewarding region, the clipped surrogate and likelihood ratios are
    # fully exercised; the larger activations amplify jax-vs-torch
    # float64 rounding, so tolerances widen to 2e-6/1e-5 (still far
    # below any semantic difference).
    tol_adapt = 1e-7 if bias == 0.0 else 2e-6
    tol_final = 1e-6 if bias == 0.0 else 1e-5
    with jax.enable_x64():
        policy = GaussianMLPPolicy(obs_dim=2, action_dim=2,
                                   hidden_sizes=HIDDEN)
        params32 = policy.init(jax.random.PRNGKey(0))
        params = {k: jnp.asarray(np.asarray(v), jnp.float64)
                  for k, v in params32.items()}
        # bias the output layer so trajectories leave the corner env's
        # L1 < 0.5 zero-reward zone: at the xavier init every reward is
        # zero and the clipped-surrogate branch of the objective would be
        # compared at identically-zero advantages (round-5 finding; the
        # non-degeneracy assert below keeps it honest)
        if bias:
            params["mean_network/output/bias"] = jnp.asarray(
                [bias, bias], jnp.float64)
        algo = ProMP(policy=policy, inner_lr=INNER_LR, learning_rate=LR,
                     num_ppo_steps=PPO_STEPS, clip_eps=CLIP_EPS,
                     init_inner_kl_penalty=KL_COEFF,
                     adaptive_inner_kl_penalty=False)
        proc = SampleProcessor(discount=GAMMA, gae_lambda=LAM,
                               normalize_adv=True)
        step_sizes = algo.init_step_sizes(params)
        train_state = {"params": params, "step_sizes": step_sizes}
        opt_state = algo.init_opt_state(train_state)
        hparams = dict(
            inner_kl_coeff=np.full((1,), KL_COEFF, np.float64),
            clip_eps=np.float64(CLIP_EPS))

        sampler = CompatPointMassSampler(
            policy, META_BS, N_ENVS, T, seed=1, dtype=jnp.float64)

        tp = torch_params(params)
        adam = TF1Adam(list(tp.keys()))

        for itr in range(2):
            tasks = sampler.sample_tasks()
            task_params = policy.replicate(train_state["params"], META_BS)

            # ---- round 0 ----
            paths0 = sampler.obtain_samples(task_params, tasks,
                                            floor_std=True)
            # oracle env math: reward recompute. Values agree to ~2 ulp
            # (jnp's and numpy's axis-norms round differently in the last
            # bit); the BRANCH decisions (dead zone, nearest-corner tie)
            # are exact — a flip would show as 0 vs O(0.1), far beyond
            # this tolerance.
            for i, path in enumerate(paths0):
                np.testing.assert_allclose(
                    oracle_rewards(path["observations"], path["actions"],
                                   tasks[i]),
                    path["rewards"], atol=1e-12, rtol=0)

            samples0 = _to_batched(paths0)
            proc0 = proc.process(dict(samples0))
            proc0.pop("stats")
            if bias:
                assert sum(float(np.abs(p["rewards"]).sum())
                           for p in paths0) > 1e-3, \
                    "degenerate data: all rewards zero"

            # oracle processing
            adv0 = []
            for i, path in enumerate(paths0):
                rets, advs = oracle_process(path["observations"],
                                            path["rewards"])
                np.testing.assert_allclose(
                    np.asarray(proc0["returns"][i]), rets, atol=1e-10)
                np.testing.assert_allclose(
                    np.asarray(proc0["advantages"][i]), advs, atol=1e-10)
                adv0.append(advs)

            # ---- inner adaptation ----
            adapted = algo.adapt(task_params, train_state["step_sizes"],
                                 proc0)
            round0_views = to_task_views(paths0, adv0)
            for i in range(META_BS):
                # numeric adaptation uses the functional (unfloored) path
                # (base.py:158-190 -> gaussian_mlp_policy.py:164-184)
                o_adapt = torch_adapt(tp, round0_views[i], floor_std=False,
                                      create_graph=False)
                for k in tp:
                    np.testing.assert_allclose(
                        np.asarray(jax.tree.map(lambda x: x[i],
                                                adapted)[k]),
                        o_adapt[k].detach().numpy(), atol=tol_adapt)

            # ---- round 1 with adapted params ----
            paths1 = sampler.obtain_samples(adapted, tasks, floor_std=False)
            samples1 = _to_batched(paths1)
            proc1 = proc.process(dict(samples1))
            proc1.pop("stats")
            adv1 = [np.asarray(proc1["advantages"][i])
                    for i in range(META_BS)]
            round1_views = to_task_views(paths1, adv1)

            # ---- outer step ----
            train_state, opt_state, _ = algo.optimize_policy(
                train_state, opt_state, [proc0, proc1], hparams)

            for _ in range(PPO_STEPS):
                loss = torch_meta_loss(tp, round0_views, round1_views)
                keys = list(tp.keys())
                grads = torch.autograd.grad(loss, [tp[k] for k in keys])
                tp = adam.step(tp, dict(zip(keys, grads)))

            for k in tp:
                np.testing.assert_allclose(
                    np.asarray(train_state["params"][k]),
                    tp[k].detach().numpy(), atol=tol_final,
                    err_msg=f"iteration {itr} param {k}")


def _to_batched(paths):
    """Compat paths (list per task of (envs, T, .) arrays) -> the batched
    samples dict the on-device processor consumes."""
    n_t = len(paths)
    n_e, T_ = paths[0]["rewards"].shape
    return dict(
        observations=jnp.asarray(
            np.stack([p["observations"] for p in paths])),
        actions=jnp.asarray(np.stack([p["actions"] for p in paths])),
        rewards=jnp.asarray(np.stack([p["rewards"] for p in paths])),
        dones=jnp.zeros((n_t, n_e, T_), jnp.bool_),
        timesteps=jnp.broadcast_to(jnp.arange(T_, dtype=jnp.int32),
                                   (n_t, n_e, T_)),
        agent_infos=dict(
            mean=jnp.asarray(
                np.stack([p["agent_infos"]["mean"] for p in paths])),
            log_std=jnp.asarray(
                np.stack([p["agent_infos"]["log_std"] for p in paths]))),
        env_infos={},
    )
