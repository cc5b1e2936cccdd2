"""Config-driven experiment wiring shared by the run scripts.

Analog of the reference run scripts' main() wiring (reference:
run_scripts/pro-mp_run_point_mass.py:21-77): build env -> policy ->
processor -> algo -> trainer from a flat config dict whose keys/values
mirror the reference's (component classes selected by name, :25-27), dump
``params.json`` provenance, and train. The same config keys accepted by the
reference scripts work here.
"""
from __future__ import annotations

import json
import os

import numpy as np


def ensure_backend():
    """Make sure a JAX backend actually initializes before building the
    stack.

    Hosts may pin an experimental platform via JAX_PLATFORMS /
    sitecustomize that is not registered in every process (round-1 ant
    validation run died on exactly this: ``RuntimeError: Backend 'axon' is
    not in the list of known backends``). Fall back to autodetection, then
    to CPU, so run scripts never crash on backend selection.
    """
    import jax
    # Hosts can pin a platform via sitecustomize, which overrides the
    # JAX_PLATFORMS env var; re-assert the user's explicit choice through
    # the config so e.g. JAX_PLATFORMS=cpu subprocess runs actually get CPU
    # instead of waiting minutes on a remote-TPU claim.
    envp = os.environ.get("JAX_PLATFORMS", "")
    if envp:
        try:
            jax.config.update("jax_platforms", envp)
            jax.devices()
            return
        except RuntimeError:
            pass
    try:
        jax.devices()
        return
    except RuntimeError:
        pass
    for platforms in ("", "tpu", "cpu"):
        try:
            jax.config.update("jax_platforms", platforms or None)
            jax.devices()
            return
        except RuntimeError:
            continue
    raise RuntimeError("no usable JAX backend (tried autodetect, tpu, cpu)")


def enable_compilation_cache(path=None):
    """Persistent XLA compilation cache: a fresh process reuses compiled
    programs from earlier runs, fixing the reference-config cold start
    (first compile of the big rollout programs takes minutes under the
    remote-TPU tunnel)."""
    import jax
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            path or os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


from promp_tpu.algos import DICEMAML, VPG_DICEMAML, ProMP, TRPOMAML, VPGMAML
from promp_tpu.envs import make_env, normalize
from promp_tpu.policies.gaussian_mlp import GaussianMLPPolicy
from promp_tpu.sampling.dice_processor import DiceSampleProcessor
from promp_tpu.sampling.processor import SampleProcessor
from promp_tpu.trainer import Trainer
from promp_tpu.utils import logger

ALGOS = {
    "ProMP": ProMP,
    "TRPOMAML": TRPOMAML,
    "VPGMAML": VPGMAML,
    "DICEMAML": DICEMAML,
    "VPG_DICEMAML": VPG_DICEMAML,
}


class ClassEncoder(json.JSONEncoder):
    """utils.py:179-185 — encode classes/callables by name in params.json."""

    def default(self, o):
        if isinstance(o, type):
            return {"$class": o.__module__ + "." + o.__name__}
        if callable(o):
            return {"$function": getattr(o, "__name__", str(o))}
        if isinstance(o, np.ndarray):
            return o.tolist()
        return json.JSONEncoder.default(self, o)


def build(config):
    """Instantiate the full stack from a reference-style config dict."""
    env_kwargs = config.get("env_kwargs", {})
    env = make_env(config["env"], **env_kwargs)
    if config.get("normalize_env", True):
        env = normalize(env)

    policy = GaussianMLPPolicy(
        obs_dim=env.obs_dim,
        action_dim=env.action_dim,
        hidden_sizes=tuple(config.get("hidden_sizes", (64, 64))),
        learn_std=config.get("learn_std", True),
    )

    algo_name = config.get("algo", "ProMP")
    if algo_name in ("DICEMAML", "VPG_DICEMAML"):
        processor = DiceSampleProcessor(
            max_path_length=config.get("max_path_length", 100),
            discount=config.get("discount", 0.99),
            gae_lambda=config.get("gae_lambda", 1.0),
            normalize_adv=config.get("normalize_adv", True),
            positive_adv=config.get("positive_adv", False),
            baseline=config.get("baseline", "LinearTimeBaseline"),
            return_baseline=(config.get("return_baseline")
                             or ("LinearFeatureBaseline"
                                 if algo_name == "VPG_DICEMAML" else None)),
        )
    else:
        processor = SampleProcessor(
            discount=config.get("discount", 0.99),
            gae_lambda=config.get("gae_lambda", 1.0),
            normalize_adv=config.get("normalize_adv", True),
            positive_adv=config.get("positive_adv", False),
            baseline=config.get("baseline", "LinearFeatureBaseline"),
        )

    common = dict(
        policy=policy,
        inner_lr=config.get("inner_lr", 0.1),
        num_inner_grad_steps=config.get("num_inner_grad_steps", 1),
        trainable_inner_step_size=config.get("trainable_inner_step_size",
                                             False),
    )
    if algo_name == "ProMP":
        algo = ProMP(
            **common,
            learning_rate=config.get("learning_rate", 1e-3),
            num_ppo_steps=config.get("num_promp_steps", 5),
            clip_eps=config.get("clip_eps", 0.3),
            target_inner_step=config.get("target_inner_step", 0.01),
            init_inner_kl_penalty=config.get("init_inner_kl_penalty", 5e-4),
            adaptive_inner_kl_penalty=config.get("adaptive_inner_kl_penalty",
                                                 False),
            anneal_factor=config.get("anneal_factor", 1.0),
            outer_kl_limit=config.get("outer_kl_limit", 0.0),
        )
    elif algo_name == "TRPOMAML":
        algo = TRPOMAML(
            **common,
            step_size=config.get("step_size", 0.01),
            inner_type=config.get("inner_type", "likelihood_ratio"),
            exploration=config.get("exploration", False),
        )
    elif algo_name == "VPGMAML":
        algo = VPGMAML(
            **common,
            learning_rate=config.get("learning_rate", 1e-3),
            inner_type=config.get("inner_type", "likelihood_ratio"),
            exploration=config.get("exploration", False),
        )
    elif algo_name in ("DICEMAML", "VPG_DICEMAML"):
        algo = ALGOS[algo_name](
            **common,
            learning_rate=config.get("learning_rate", 1e-3),
        )
    else:
        raise KeyError(f"Unknown algo {algo_name!r}")

    mesh = None
    if config.get("n_devices"):
        from promp_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(config["n_devices"])

    trainer = Trainer(
        algo=algo,
        env=env,
        policy=policy,
        sample_processor=processor,
        meta_batch_size=config.get("meta_batch_size", 40),
        rollouts_per_meta_task=config.get("rollouts_per_meta_task", 20),
        max_path_length=config.get("max_path_length", 100),
        n_itr=config.get("n_itr", 1001),
        seed=config.get("seed", 1),
        fused=config.get("fused", False),
        # per-iteration phase timing by default (reference-faithful);
        # long benchmark runs set e.g. 10 to amortize the host barriers
        timing_every=config.get("timing_every", 1),
        mesh=mesh,
    )
    return trainer


def run_experiment(config, dump_path=None):
    """Configure logging, dump provenance, train — the reference scripts'
    main() (pro-mp_run_point_mass.py:129-138)."""
    ensure_backend()
    enable_compilation_cache()
    logger.configure(
        dir=dump_path,
        format_strs=config.get("log_formats", ["stdout", "log", "csv"]),
        snapshot_mode=config.get("snapshot_mode", "last_gap"),
        snapshot_gap=config.get("snapshot_gap", 10),
    )
    dump_dir = logger.get_dir()
    with open(os.path.join(dump_dir, "params.json"), "w") as f:
        json.dump(config, f, cls=ClassEncoder, indent=1)
    trainer = build(config)
    return trainer.train()
