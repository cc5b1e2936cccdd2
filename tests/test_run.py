"""End-to-end tests of the config-driven experiment wiring (promp_tpu/run.py).

Mirrors the reference's user-facing entry surface: run scripts build the
full stack from a flat config dict with component classes selected by name
(reference run_scripts/pro-mp_run_point_mass.py:21-77) and dump params.json
provenance (:135). Every algorithm the reference ships must be reachable
through this path.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from promp_tpu.run import build, run_experiment

TINY = {
    "seed": 0,
    "env": "MetaPointEnvCorner",
    "env_kwargs": {"reward_type": "dense"},
    "rollouts_per_meta_task": 2,
    "max_path_length": 5,
    "meta_batch_size": 2,
    "num_inner_grad_steps": 1,
    "hidden_sizes": (8, 8),
    "n_itr": 1,
    "snapshot_mode": "none",
    "log_formats": ["csv"],
}


def finite_params(state):
    flat = jnp.concatenate([jnp.ravel(v) for v in state["params"].values()])
    return bool(jnp.all(jnp.isfinite(flat)))


class TestBuildAllAlgos:
    """build() must wire every reference algorithm by its config name
    (ProMP pro_mp.py, TRPOMAML trpo_maml.py, VPGMAML vpg_maml.py,
    DICEMAML dice_maml.py, VPG_DICEMAML vpg_dice_maml.py)."""

    @pytest.mark.parametrize("algo", [
        "ProMP", "TRPOMAML", "VPGMAML", "DICEMAML", "VPG_DICEMAML"])
    def test_build_and_one_iteration(self, algo):
        config = dict(TINY, algo=algo)
        if algo == "ProMP":
            config["num_promp_steps"] = 2
        trainer = build(config)
        state = trainer.train()
        assert finite_params(state)

    @pytest.mark.parametrize("algo", ["TRPOMAML", "VPGMAML"])
    def test_emaml_exploration_flag(self, algo):
        """exploration=True is the E-MAML variant (reference
        e-maml_run_mujoco.py:53-61)."""
        trainer = build(dict(TINY, algo=algo, exploration=True))
        assert trainer.algo.exploration
        state = trainer.train()
        assert finite_params(state)

    def test_unknown_algo_rejected(self):
        with pytest.raises(KeyError):
            build(dict(TINY, algo="NotAnAlgo"))

    def test_dice_gets_dice_processor(self):
        from promp_tpu.sampling.dice_processor import DiceSampleProcessor
        trainer = build(dict(TINY, algo="DICEMAML"))
        assert isinstance(trainer.sample_processor, DiceSampleProcessor)


class TestRunExperiment:
    def test_params_json_and_progress_csv(self, tmp_path):
        d = str(tmp_path / "exp")
        config = dict(TINY, algo="ProMP", num_promp_steps=2)
        run_experiment(config, dump_path=d)
        with open(os.path.join(d, "params.json")) as f:
            params = json.load(f)
        assert params["algo"] == "ProMP"
        assert params["meta_batch_size"] == 2
        csv_path = os.path.join(d, "progress.csv")
        with open(csv_path) as f:
            header = f.readline().strip().split(",")
        # the reference's per-iteration keys (meta_trainer.py:131-142,
        # samplers/base.py:135-149)
        for key in ("Itr", "n_timesteps", "Time-Sampling", "Time-OuterStep",
                    "Step_1-AverageReturn"):
            assert key in header, key

    def test_config_determinism_across_builds(self, tmp_path):
        config = dict(TINY, algo="VPGMAML", seed=11)
        s1 = build(config).train()
        s2 = build(config).train()
        for k in s1["params"]:
            np.testing.assert_array_equal(np.asarray(s1["params"][k]),
                                          np.asarray(s2["params"][k]))


class TestRunScriptSmoke:
    def test_point_mass_script_subprocess(self, tmp_path):
        """The actual CLI entry point runs end-to-end from a --config_file
        (reference pro-mp_run_point_mass.py:79-138)."""
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfg = dict(TINY, algo="ProMP", num_promp_steps=2)
        cfg["hidden_sizes"] = list(cfg["hidden_sizes"])
        cfg_path = str(tmp_path / "cfg.json")
        with open(cfg_path, "w") as f:
            json.dump(cfg, f)
        dump = str(tmp_path / "out")
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.run(
            [sys.executable,
             os.path.join(repo, "run_scripts", "pro-mp_run_point_mass.py"),
             "--config_file", cfg_path, "--dump_path", dump],
            env=env, capture_output=True, text=True, timeout=420)
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert os.path.exists(os.path.join(dump, "params.json"))
        assert os.path.exists(os.path.join(dump, "progress.csv"))
