"""Float64 oracle extension: TRPO-MAML and DICE-MAML (VERDICT r4 item 5).

tests/test_parity_oracle.py pins the ProMP path end-to-end against an
independent float64 torch implementation; this file extends the oracle to
the two remaining second-order paths the round-4 review called out:

  * ONE TRPO-MAML outer step: the meta surrogate (post-update likelihood-
    ratio objective, trpo_maml.py:125-152), the exact-HVP conjugate-
    gradient solve (conjugate_gradient_optimizer.py:325-354 semantics),
    the sqrt(2 delta / dHd) initial step, and the 0.8^k backtracking line
    search with its accept/NaN-reject rules (:277-303) — final parameters
    must match an independent torch float64 implementation to <= 1e-6 and
    the DECISIONS (backtrack count, acceptance) must match exactly.
  * ONE DICE-MAML inner + outer step: the magic-box operator
    exp(tau - stop_grad(tau)) over cumulative log-probs (dice_maml.py:
    245-259), the time-baseline-adjusted discounted rewards
    (dice_sample_processor.py:98-162, incl. the padded-normalization
    quirk), the DICE inner adaptation and the Adam outer step — numpy
    processing to <= 1e-10, adaptation to <= 1e-9, parameters after the
    outer step to <= 1e-6.

Shared trajectory data comes from the same reference-RNG compat sampler
the ProMP oracle uses, so the torch side sees byte-identical inputs.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from test_parity_oracle import (  # noqa: E402  (pytest sibling import)
    TF1Adam, _to_batched, to_task_views, torch_adapt, torch_forward,
    torch_kl, torch_loglik, torch_params)

from promp_tpu.algos import DICEMAML, TRPOMAML
from promp_tpu.policies.gaussian_mlp import GaussianMLPPolicy
from promp_tpu.sampling.compat_sampler import CompatPointMassSampler
from promp_tpu.sampling.dice_processor import DiceSampleProcessor
from promp_tpu.sampling.processor import SampleProcessor

META_BS, N_ENVS, T = 4, 3, 20
HIDDEN = (32, 32)
INNER_LR = 0.1
GAMMA, LAM = 0.99, 1.0
STEP_SIZE = 0.01
CG_ITERS = 10
HVP_REG = 1e-5
BACKTRACK_RATIO, MAX_BACKTRACKS = 0.8, 15


def _setup(algo_cls, seed, **algo_kwargs):
    policy = GaussianMLPPolicy(obs_dim=2, action_dim=2, hidden_sizes=HIDDEN)
    params32 = policy.init(jax.random.PRNGKey(0))
    params = {k: jnp.asarray(np.asarray(v), jnp.float64)
              for k, v in params32.items()}
    # Bias the output layer so trajectories drift past the corner env's
    # L1 < 0.5 dead zone: at the xavier init the NormalizedEnv affine
    # (action * 0.02) keeps positions inside it, every reward is zero and
    # the surrogate gradient VANISHES — the oracle would compare no-ops.
    # (The tests below assert the gradients are actually nonzero.)
    params["mean_network/output/bias"] = jnp.asarray([3.0, 3.0],
                                                     jnp.float64)
    algo = algo_cls(policy=policy, inner_lr=INNER_LR,
                    num_inner_grad_steps=1, **algo_kwargs)
    step_sizes = algo.init_step_sizes(params)
    sampler = CompatPointMassSampler(policy, META_BS, N_ENVS, T, seed=seed,
                                     dtype=jnp.float64)
    return policy, params, algo, step_sizes, sampler


# ----------------------------------------------------------- TRPO oracle
def _flat(tensors):
    return torch.cat([t.reshape(-1) for t in tensors])


def torch_trpo_meta(tp, round0, round1, want):
    """(surrogate loss, mean outer KL) with grads THROUGH the inner step
    (trpo_maml.py:125-159). ``want`` selects which to build (autograd
    graphs are built per call, like the jax closures)."""
    surr, kls = [], []
    for i in range(META_BS):
        adapted = torch_adapt(tp, round0[i], floor_std=True,
                              create_graph=True)
        d1 = round1[i]
        mean1, log_std1 = torch_forward(adapted, d1["obs"], floor_std=False)
        if want == "loss":
            lr = torch.exp(torch_loglik(d1["act"], mean1, log_std1)
                           - d1["old_loglik"])
            surr.append(-(lr * d1["adv"]).mean())
        else:
            kls.append(torch_kl(d1["old_mean"], d1["old_log_std"],
                                mean1, log_std1).mean())
    return (torch.stack(surr).mean() if want == "loss"
            else torch.stack(kls).mean())


def test_trpo_maml_outer_step_matches_oracle():
    with jax.enable_x64():
        policy, params, algo, step_sizes, sampler = _setup(
            TRPOMAML, seed=7, step_size=STEP_SIZE, cg_iters=CG_ITERS)
        proc = SampleProcessor(discount=GAMMA, gae_lambda=LAM,
                               normalize_adv=True)
        tasks = sampler.sample_tasks()
        task_params = policy.replicate(params, META_BS)
        paths0 = sampler.obtain_samples(task_params, tasks, floor_std=True)
        proc0 = proc.process(_to_batched(paths0))
        proc0.pop("stats")
        adapted = algo.adapt(task_params, step_sizes, proc0)
        paths1 = sampler.obtain_samples(adapted, tasks, floor_std=False)
        proc1 = proc.process(_to_batched(paths1))
        proc1.pop("stats")

        train_state = {"params": params, "step_sizes": step_sizes}
        new_state, _, metrics = algo.optimize_policy(
            train_state, (), [proc0, proc1], {})

        # ---------------- independent torch float64 implementation
        adv0 = [np.asarray(proc0["advantages"][i]) for i in range(META_BS)]
        adv1 = [np.asarray(proc1["advantages"][i]) for i in range(META_BS)]
        round0 = to_task_views(paths0, adv0)
        round1 = to_task_views(paths1, adv1)
        tp = torch_params(params)
        keys = list(tp.keys())

        def loss_at(p):
            return torch_trpo_meta(p, round0, round1, "loss")

        def kl_at(p):
            return torch_trpo_meta(p, round0, round1, "kl")

        loss_before = loss_at(tp)
        g = _flat(torch.autograd.grad(loss_before, [tp[k] for k in keys]))
        loss_before = float(loss_before)
        assert float(g.abs().max()) > 1e-8, "degenerate data: zero gradient"

        kl = kl_at(tp)
        kl_grads = torch.autograd.grad(kl, [tp[k] for k in keys],
                                       create_graph=True)
        kl_gflat = _flat(kl_grads)

        def hvp(v):
            gv = (kl_gflat * v).sum()
            hv = _flat(torch.autograd.grad(gv, [tp[k] for k in keys],
                                           retain_graph=True))
            return hv.detach() + HVP_REG * v

        # CG, conjugate_gradient_optimizer.py:325-354 order of operations
        b = g.detach()
        x = torch.zeros_like(b)
        r, p = b.clone(), b.clone()
        rdotr = (r @ r).item()
        for _ in range(CG_ITERS):
            if rdotr < 1e-10:
                break
            z = hvp(p)
            v = rdotr / float(p @ z)
            x = x + v * p
            r = r - v * z
            newrdotr = float(r @ r)
            p = r + (newrdotr / rdotr) * p
            rdotr = newrdotr

        dHd = float(x @ hvp(x))
        init_step_size = np.sqrt(2.0 * STEP_SIZE / (dHd + 1e-8))
        init_step = init_step_size * x
        prev_flat = _flat([tp[k].detach() for k in keys])

        def unflatten(flat):
            out, i = {}, 0
            for k in keys:
                n = tp[k].numel()
                out[k] = flat[i:i + n].reshape(tp[k].shape).clone(
                    ).requires_grad_(True)
                i += n
            return out

        def evaluate(n):
            cand = unflatten(prev_flat - (BACKTRACK_RATIO ** n) * init_step)
            return (cand, float(loss_at(cand).detach()),
                    float(kl_at(cand).detach()))

        cand, loss, klv = evaluate(0.0)
        n = 1
        while (n < MAX_BACKTRACKS
               and not (loss < loss_before and klv <= STEP_SIZE)):
            cand, loss, klv = evaluate(float(n))
            n += 1

        violated = (np.isnan(loss) or np.isnan(klv)
                    or loss >= loss_before or klv >= STEP_SIZE)
        take_step = not np.isnan(init_step_size) and not violated

        # decisions must match exactly
        assert bool(metrics["StepRejected"]) == (not take_step)
        assert int(metrics["BacktrackIters"]) == n - 1
        final = cand if take_step else {k: tp[k] for k in keys}
        for k in keys:
            np.testing.assert_allclose(
                np.asarray(new_state["params"][k]),
                final[k].detach().numpy(), atol=1e-6, err_msg=k)
        # and the step must actually have been taken on this data
        assert take_step


# ----------------------------------------------------------- DICE oracle
def torch_magic_box(logp):
    tau = torch.cumsum(logp, dim=-1)
    return torch.exp(tau - tau.detach())


def torch_dice_objective(p, d, floor_std):
    """-E[magicbox * adjusted_rewards * mask] over (P, T) (dice_maml.py:
    41-47); obs here keep the (P, T, 2) layout."""
    mean, log_std = torch_forward(p, d["obs_tm"], floor_std)
    logp = torch_loglik(d["act_tm"], mean, log_std)           # (P, T)
    return -(torch_magic_box(logp) * d["adj"] * d["mask"]).mean()


def oracle_dice_process(rewards):
    """numpy mirror of DiceSampleProcessor for never-done fixed-T paths:
    gamma^t discounting, LinearTimeBaseline fit on the discounted
    rewards, padded normalization (dice_sample_processor.py:98-162)."""
    P, T_ = rewards.shape
    t = np.arange(T_, dtype=np.float64)
    disc = rewards * (GAMMA ** t)[None, :]
    al = (t / 100.0)[:, None]
    feats = np.concatenate([al, al**2, al**3, np.ones_like(al)], axis=1)
    featmat = np.tile(feats, (P, 1))
    target = disc.reshape(-1)
    coeffs = np.linalg.solve(
        featmat.T @ featmat + 1e-5 * np.eye(4), featmat.T @ target)
    adjusted = disc - (feats @ coeffs)[None, :]
    return (adjusted - adjusted.mean()) / (adjusted.std() + 1e-8)


def test_dice_inner_and_outer_step_match_oracle():
    with jax.enable_x64():
        policy, params, algo, step_sizes, sampler = _setup(
            DICEMAML, seed=11, learning_rate=1e-3, max_epochs=1)
        proc = DiceSampleProcessor(max_path_length=T, discount=GAMMA,
                                   normalize_adv=True)
        tasks = sampler.sample_tasks()
        task_params = policy.replicate(params, META_BS)
        paths0 = sampler.obtain_samples(task_params, tasks, floor_std=True)
        proc0 = proc.process(_to_batched(paths0))
        proc0.pop("stats")

        # ---- processing oracle: adjusted rewards to 1e-10
        adj0 = []
        for i, path in enumerate(paths0):
            adj = oracle_dice_process(np.asarray(path["rewards"],
                                                 np.float64))
            np.testing.assert_allclose(
                np.asarray(proc0["adjusted_rewards"][i]), adj, atol=1e-10)
            adj0.append(adj)
        assert max(np.abs(a).max() for a in adj0) > 1e-3, \
            "degenerate data: all rewards zero"

        # ---- inner adaptation oracle (magic-box gradient)
        adapted = algo.adapt(task_params, step_sizes, proc0)
        tp = torch_params(params)

        def dice_views(paths, adjs):
            views = []
            for path, adj in zip(paths, adjs):
                views.append(dict(
                    obs_tm=torch.tensor(np.asarray(path["observations"],
                                                   np.float64)),
                    act_tm=torch.tensor(np.asarray(path["actions"],
                                                   np.float64)),
                    adj=torch.tensor(adj),
                    mask=torch.ones(adj.shape, dtype=torch.float64)))
            return views

        views0 = dice_views(paths0, adj0)
        for i in range(META_BS):
            loss = torch_dice_objective(tp, views0[i], floor_std=False)
            keys = list(tp.keys())
            grads = torch.autograd.grad(loss, [tp[k] for k in keys])
            o_adapt = {k: tp[k] - INNER_LR * gr
                       for k, gr in zip(keys, grads)}
            for k in keys:
                np.testing.assert_allclose(
                    np.asarray(jax.tree.map(lambda x: x[i], adapted)[k]),
                    o_adapt[k].detach().numpy(), atol=1e-9,
                    err_msg=f"task {i} param {k}")

        # ---- round 1 + outer step (grads through the magic box)
        paths1 = sampler.obtain_samples(adapted, tasks, floor_std=False)
        proc1 = proc.process(_to_batched(paths1))
        proc1.pop("stats")
        adj1 = [np.asarray(proc1["adjusted_rewards"][i])
                for i in range(META_BS)]
        views1 = dice_views(paths1, adj1)

        train_state = {"params": params, "step_sizes": step_sizes}
        opt_state = algo.init_opt_state(train_state)
        hparams = {k: jnp.asarray(v)
                   for k, v in algo.init_hparams().items()}
        new_state, _, _ = algo.optimize_policy(train_state, opt_state,
                                               [proc0, proc1], hparams)

        def meta_loss(p):
            objs = []
            for i in range(META_BS):
                ad = torch_adapt_dice(p, views0[i])
                objs.append(torch_dice_objective(ad, views1[i],
                                                 floor_std=False))
            return torch.stack(objs).mean()

        def torch_adapt_dice(p, d):
            loss = torch_dice_objective(p, d, floor_std=True)
            keys = list(p.keys())
            grads = torch.autograd.grad(loss, [p[k] for k in keys],
                                        create_graph=True)
            return {k: p[k] - INNER_LR * gr for k, gr in zip(keys, grads)}

        adam = TF1Adam(list(tp.keys()), lr=1e-3)
        loss = meta_loss(tp)
        keys = list(tp.keys())
        grads = torch.autograd.grad(loss, [tp[k] for k in keys])
        tp = adam.step(tp, dict(zip(keys, grads)))

        # note: step_sizes are in train_state but masked non-trainable, so
        # only the policy params move
        for k in keys:
            np.testing.assert_allclose(
                np.asarray(new_state["params"][k]),
                tp[k].detach().numpy(), atol=1e-6, err_msg=k)


# ------------------------------------------------- VPG-MAML/E-MAML oracle
def test_vpg_maml_emaml_outer_step_matches_oracle():
    """ONE VPG-MAML outer step WITH the E-MAML exploration term against an
    independent torch float64 implementation: the REINFORCE meta-objective
    on post-update distributions (vpg_maml.py:119-139), the exploration
    credit ``- mean(adj_avg_rewards[last round]) * mean(log pi_0(a_0))``
    on PRE-update actions with gradients flowing to the pre-update policy
    (:127-134), and the TF1-Adam outer update
    (maml_first_order_optimizer.py:82-115). Closes the one algorithm
    family the r4 oracle suite left to self-consistency tests."""
    from promp_tpu.algos import VPGMAML
    with jax.enable_x64():
        # seed 7: all four corners drawn as tasks, so the biased (+,+)
        # drift earns nonzero sparse rewards and the exploration
        # coefficients are far from zero (seeds whose task draw excludes
        # the (2,2) corner yield all-zero rewards -> a no-op oracle)
        policy, params, algo, step_sizes, sampler = _setup(
            VPGMAML, seed=7, learning_rate=1e-3, exploration=True,
            max_epochs=1)
        proc = SampleProcessor(discount=GAMMA, gae_lambda=LAM,
                               normalize_adv=True)
        tasks = sampler.sample_tasks()
        task_params = policy.replicate(params, META_BS)
        paths0 = sampler.obtain_samples(task_params, tasks, floor_std=True)
        proc0 = proc.process(_to_batched(paths0))
        proc0.pop("stats")
        adapted = algo.adapt(task_params, step_sizes, proc0)
        paths1 = sampler.obtain_samples(adapted, tasks, floor_std=False)
        proc1 = proc.process(_to_batched(paths1))
        proc1.pop("stats")

        train_state = {"params": params, "step_sizes": step_sizes}
        opt_state = algo.init_opt_state(train_state)
        new_state, _, metrics = algo.optimize_policy(
            train_state, opt_state, [proc0, proc1], algo.init_hparams())

        # ---------------- independent torch float64 implementation
        adv0 = [np.asarray(proc0["advantages"][i]) for i in range(META_BS)]
        adv1 = [np.asarray(proc1["advantages"][i]) for i in range(META_BS)]
        round0 = to_task_views(paths0, adv0)
        round1 = to_task_views(paths1, adv1)
        # exploration coefficients: LAST round's globally z-scored rewards
        # (meta_sample_processor.py:39-44), averaged per task
        adj_mean = [float(np.mean(np.asarray(proc1["adj_avg_rewards"][i])))
                    for i in range(META_BS)]
        assert max(abs(a) for a in adj_mean) > 1e-3, \
            "degenerate data: zero exploration coefficients"
        tp = torch_params(params)
        keys = list(tp.keys())

        def meta_loss(p):
            objs = []
            for i in range(META_BS):
                ad = torch_adapt(p, round0[i], floor_std=True,
                                 create_graph=True)
                d1 = round1[i]
                mean1, ls1 = torch_forward(ad, d1["obs"], floor_std=False)
                obj = -(torch_loglik(d1["act"], mean1, ls1)
                        * d1["adv"]).mean()
                # E-MAML term: pre-update dists from the CURRENT params
                # (floored variable path), pre-update actions
                mean0, ls0 = torch_forward(p, round0[i]["obs"],
                                           floor_std=True)
                logli0 = torch_loglik(round0[i]["act"], mean0, ls0)
                obj = obj - adj_mean[i] * logli0.mean()
                objs.append(obj)
            return torch.stack(objs).mean()

        loss = meta_loss(tp)
        np.testing.assert_allclose(float(metrics["LossBefore"]),
                                   float(loss), atol=1e-9)
        grads = torch.autograd.grad(loss, [tp[k] for k in keys])
        assert max(float(g.abs().max()) for g in grads) > 1e-8
        adam = TF1Adam(keys, lr=1e-3)
        tp = adam.step(tp, dict(zip(keys, grads)))
        for k in keys:
            np.testing.assert_allclose(
                np.asarray(new_state["params"][k]),
                tp[k].detach().numpy(), atol=1e-6, err_msg=k)

        # the exploration term must have mattered: the same step WITHOUT
        # it lands on measurably different parameters
        algo_off = VPGMAML(policy=policy, inner_lr=INNER_LR,
                           num_inner_grad_steps=1, learning_rate=1e-3,
                           exploration=False, max_epochs=1)
        state_off, _, _ = algo_off.optimize_policy(
            {"params": params, "step_sizes": step_sizes},
            algo_off.init_opt_state(train_state), [proc0, proc1],
            algo_off.init_hparams())
        diff = max(float(jnp.max(jnp.abs(state_off["params"][k]
                                         - new_state["params"][k])))
                   for k in keys)
        assert diff > 1e-7, "exploration term had no effect on the step"
