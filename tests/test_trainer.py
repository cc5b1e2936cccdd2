"""Trainer orchestration, checkpoint/resume, logger, sweep tests."""
import csv
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from promp_tpu.algos import ProMP
from promp_tpu.envs import MetaPointEnvCorner, normalize
from promp_tpu.policies.gaussian_mlp import GaussianMLPPolicy
from promp_tpu.sampling.processor import SampleProcessor
from promp_tpu.trainer import Trainer
from promp_tpu.utils import logger
from promp_tpu.utils.checkpoints import (
    latest_snapshot, load_snapshot, resume_trainer, save_snapshot)


def make_trainer(n_itr=2, seed=0, num_inner_grad_steps=1, **kwargs):
    env = normalize(MetaPointEnvCorner(reward_type="dense"))
    policy = GaussianMLPPolicy(obs_dim=2, action_dim=2, hidden_sizes=(8, 8))
    algo = ProMP(policy=policy, num_inner_grad_steps=num_inner_grad_steps,
                 num_ppo_steps=2, adaptive_inner_kl_penalty=False)
    return Trainer(algo=algo, env=env, policy=policy,
                   sample_processor=SampleProcessor(normalize_adv=True),
                   meta_batch_size=2, rollouts_per_meta_task=2,
                   max_path_length=8, n_itr=n_itr, seed=seed, **kwargs)


class TestTrainer:
    def test_multi_inner_step(self):
        trainer = make_trainer(num_inner_grad_steps=2)
        state = trainer.train()
        flat = jnp.concatenate([jnp.ravel(v)
                                for v in state["params"].values()])
        assert bool(jnp.all(jnp.isfinite(flat)))

    def test_deterministic_given_seed(self):
        s1 = make_trainer(seed=7).train()
        s2 = make_trainer(seed=7).train()
        for k in s1["params"]:
            np.testing.assert_array_equal(np.asarray(s1["params"][k]),
                                          np.asarray(s2["params"][k]))
        s3 = make_trainer(seed=8).train()
        assert any(not np.allclose(np.asarray(s1["params"][k]),
                                   np.asarray(s3["params"][k]))
                   for k in s1["params"])

    def test_snapshot_resume_bit_identical(self, tmp_path):
        # run 4 iterations straight
        straight = make_trainer(n_itr=4, seed=3).train()

        # run 2, snapshot, restore into a fresh trainer, run 2 more
        t1 = make_trainer(n_itr=2, seed=3)
        t1.train()
        snap_path = str(tmp_path / "snap.pkl")
        save_snapshot(snap_path, t1.get_itr_snapshot(1))

        t2 = make_trainer(n_itr=4, seed=3)
        t2.restore(load_snapshot(snap_path))
        assert t2.start_itr == 2
        resumed = t2.train()

        for k in straight["params"]:
            np.testing.assert_allclose(np.asarray(straight["params"][k]),
                                       np.asarray(resumed["params"][k]),
                                       rtol=1e-6, atol=1e-7)

    def test_latest_snapshot_discovery(self, tmp_path):
        d = str(tmp_path)
        save_snapshot(os.path.join(d, "itr_3.pkl"), {"itr": 3})
        save_snapshot(os.path.join(d, "itr_10.pkl"), {"itr": 10})
        assert latest_snapshot(d).endswith("itr_10.pkl")
        save_snapshot(os.path.join(d, "params.pkl"), {"itr": 11})
        assert latest_snapshot(d).endswith("params.pkl")


class TestLogger:
    def test_csv_and_json_outputs(self, tmp_path):
        d = str(tmp_path)
        logger.configure(dir=d, format_strs=["csv", "json", "log"])
        logger.logkv("a", 1.0)
        logger.logkv("b", 2.0)
        logger.dumpkvs()
        logger.logkv("a", 3.0)
        logger.logkv("c", 5.0)  # new key appears mid-run
        logger.dumpkvs()
        rows = list(csv.DictReader(open(os.path.join(d, "progress.csv"))))
        assert float(rows[0]["a"]) == 1.0
        assert rows[0]["c"] == ""
        assert float(rows[1]["c"]) == 5.0
        jlines = [json.loads(l) for l in
                  open(os.path.join(d, "progress.json"))]
        assert jlines[1]["a"] == 3.0

    def test_tensorboard_output_format(self, tmp_path):
        """The dependency-free TB writer emits valid TFRecord event files
        (reference logger.py:148-195 via TF1's EventsWriter): records frame
        with masked CRC-32C, and scalars decode back (tag + simple_value)."""
        import struct

        from promp_tpu.utils.logger import _masked_crc

        d = str(tmp_path)
        logger.configure(dir=d, format_strs=["tensorboard"])
        logger.logkv("Itr", 3)
        logger.logkv("AverageReturn", -12.5)
        logger.dumpkvs()
        logger._get().close()

        tbdir = os.path.join(d, "tb")
        files = os.listdir(tbdir)
        assert len(files) == 1 and files[0].startswith("events.out.tfevents")
        blob = open(os.path.join(tbdir, files[0]), "rb").read()
        records = []
        off = 0
        while off < len(blob):
            (length,) = struct.unpack_from("<Q", blob, off)
            (len_crc,) = struct.unpack_from("<I", blob, off + 8)
            assert len_crc == _masked_crc(blob[off:off + 8])
            data = blob[off + 12:off + 12 + length]
            (data_crc,) = struct.unpack_from("<I", blob, off + 12 + length)
            assert data_crc == _masked_crc(data)
            records.append(data)
            off += 16 + length
        assert len(records) == 2  # file_version header + one summary event
        assert b"brain.Event:2" in records[0]
        assert b"AverageReturn" in records[1]
        # simple_value float encoding present
        assert struct.pack("<f", -12.5) in records[1]

    def test_logkv_mean(self, tmp_path):
        logger.configure(dir=str(tmp_path), format_strs=["csv"])
        logger.logkv_mean("x", 1.0)
        logger.logkv_mean("x", 3.0)
        assert logger._get().name2val["x"] == 2.0
        logger.dumpkvs()

    def test_snapshot_modes(self, tmp_path):
        d = str(tmp_path)
        logger.configure(dir=d, format_strs=["csv"], snapshot_mode="gap",
                         snapshot_gap=5)
        logger.save_itr_params(3, {"x": 1})
        logger.sync_snapshots()
        assert not os.path.exists(os.path.join(d, "itr_3.pkl"))
        logger.save_itr_params(5, {"x": 1})
        logger.sync_snapshots()
        assert os.path.exists(os.path.join(d, "itr_5.pkl"))

    def test_profile_kv(self, tmp_path):
        logger.configure(dir=str(tmp_path), format_strs=["csv"])
        with logger.ProfileKV("phase"):
            pass
        assert "wait_phase" in logger._get().name2val


class TestSweep:
    def test_variant_product_and_serial_mode(self, tmp_path):
        from promp_tpu.experiment_utils.run_sweep import (
            run_sweep, variant_dicts)
        variants = variant_dicts({"a": [1, 2], "b": ["x"]})
        assert variants == [{"a": 1, "b": "x"}, {"a": 2, "b": "x"}]

        seen = []

        def fake_run(config, dump_path=None):
            seen.append((config["a"], dump_path))
            return config["a"]

        results = run_sweep(fake_run, {"a": [1, 2]}, "exp",
                            base_config={"c": 9}, mode="serial",
                            data_dir=str(tmp_path))
        assert results == [1, 2]
        assert all("exp" in p for _, p in seen)

    def _check_script(self, path):
        import stat
        import subprocess
        assert os.stat(path).st_mode & stat.S_IXUSR
        subprocess.run(["bash", "-n", path], check=True)  # parses clean
        return open(path).read()

    def test_docker_mode_generates_launch_artifacts(self, tmp_path):
        import json as _json

        from promp_tpu.experiment_utils.run_sweep import run_sweep
        script = run_sweep(None, {"a": [1, 2], "b": [0.5]}, "exp",
                           base_config={"c": 9}, mode="docker",
                           data_dir=str(tmp_path),
                           python_entry="run_scripts/pro-mp_run_mujoco.py")
        launch = os.path.join(str(tmp_path), "exp", "launch")
        text = self._check_script(script)
        assert text.count("docker run") == 2
        assert "docker build" in text
        assert os.path.exists(os.path.join(launch, "Dockerfile"))
        cfgs = sorted(f for f in os.listdir(launch)
                      if f.startswith("config_"))
        assert len(cfgs) == 2
        loaded = [_json.load(open(os.path.join(launch, f))) for f in cfgs]
        assert {c["a"] for c in loaded} == {1, 2}
        assert all(c["c"] == 9 and c["b"] == 0.5 for c in loaded)

    def test_slurm_mode_generates_sbatch_per_variant(self, tmp_path):
        from promp_tpu.experiment_utils.run_sweep import run_sweep
        script = run_sweep(None, {"a": [1, 2, 3]}, "exp", mode="slurm",
                           data_dir=str(tmp_path),
                           python_entry="run_scripts/pro-mp_run_mujoco.py",
                           slurm_opts={"partition": "tpu",
                                       "time": "04:00:00"})
        launch = os.path.dirname(script)
        submit = self._check_script(script)
        jobs = sorted(f for f in os.listdir(launch) if f.endswith(".sbatch"))
        assert len(jobs) == 3
        assert submit.count("sbatch job_") == 3
        body = self._check_script(os.path.join(launch, jobs[0]))
        assert "#SBATCH --partition=tpu" in body
        assert "#SBATCH --time=04:00:00" in body
        assert "--config_file" in body and "--dump_path" in body

    def test_gcloud_mode_round_robins_workers(self, tmp_path):
        from promp_tpu.experiment_utils.run_sweep import run_sweep
        script = run_sweep(None, {"a": [1, 2, 3]}, "exp", mode="gcloud-tpu",
                           data_dir=str(tmp_path),
                           python_entry="run_scripts/pro-mp_run_mujoco.py",
                           gcloud_workers=["vm-a", "vm-b"])
        text = self._check_script(script)
        assert text.count("tpus tpu-vm ssh vm-a") == 2  # variants 0, 2
        assert text.count("tpus tpu-vm ssh vm-b") == 1
        assert text.rstrip().endswith("wait")


class TestNativeSink:
    def test_async_sink_roundtrip(self, tmp_path):
        from promp_tpu.utils.native import AsyncFileSink, ensure_built
        path = str(tmp_path / "out.txt")
        sink = AsyncFileSink(path)
        for i in range(500):
            sink.write(f"line{i}\n")
        sink.flush()
        sink.close()
        lines = open(path).read().splitlines()
        assert len(lines) == 500
        assert lines[499] == "line499"


class TestNativeCheckpointWriter:
    def test_async_durable_roundtrip(self, tmp_path):
        import pickle

        from promp_tpu.utils.native import AsyncCheckpointWriter
        w = AsyncCheckpointWriter()
        path = str(tmp_path / "params.pkl")
        # several writes to the same path: FIFO order, last wins
        seqs = [w.submit(path, pickle.dumps({"itr": i})) for i in range(5)]
        assert w.wait(seqs[-1])
        assert pickle.load(open(path, "rb")) == {"itr": 4}
        assert w.errors() == 0
        w.close()

    def test_failed_write_reported(self, tmp_path):
        from promp_tpu.utils.native import AsyncCheckpointWriter
        w = AsyncCheckpointWriter()
        if not w.native:
            pytest.skip("native ckptwriter unavailable")
        seq = w.submit(str(tmp_path / "no_such_dir" / "x.pkl"), b"data")
        assert w._lib.ckpt_wait(w._handle, seq, 5000) == -1
        assert w.errors() == 1
        w.close()

    def test_logger_snapshot_uses_async_writer(self, tmp_path):
        import pickle

        from promp_tpu.utils import logger
        logger.configure(dir=str(tmp_path), format_strs=[],
                         snapshot_mode="last")
        logger.save_itr_params(3, {"itr": 3, "x": 1})
        assert logger.sync_snapshots()
        snap = pickle.load(open(tmp_path / "params.pkl", "rb"))
        assert snap == {"itr": 3, "x": 1}
        # no torn tmp files left behind
        assert [p for p in tmp_path.iterdir() if ".tmp" in p.name] == []


class TestDiagnostics:
    def test_env_diagnostics_keys_logged(self):
        from promp_tpu.envs import make_env
        env = make_env("HalfCheetahRandVelEnv")
        policy = GaussianMLPPolicy(obs_dim=env.obs_dim,
                                   action_dim=env.action_dim,
                                   hidden_sizes=(8,))
        algo = ProMP(policy=policy, num_ppo_steps=1,
                     adaptive_inner_kl_penalty=False)
        trainer = Trainer(algo=algo, env=env, policy=policy,
                          sample_processor=SampleProcessor(),
                          meta_batch_size=2, rollouts_per_meta_task=2,
                          max_path_length=5, n_itr=1, seed=0)
        metrics, _ = trainer._run_phases(jax.random.PRNGKey(0))
        assert "Step_0-Env-forward_vel" in metrics
        assert "Step_1-Env-reward_run" in metrics
        # reference-named diagnostics incl. the AvgCtrlCost=std quirk
        # (half_cheetah_rand_vel.py:57-64)
        assert "Step_0-AvgForwardVel" in metrics
        assert "Step_0-AvgFinalForwardVel" in metrics
        assert "Step_1-AvgCtrlCost" in metrics

    def test_diagnostics_spreads_swimmer_and_ant(self):
        """Average/Max/Min/Std spreads mirror swimmer_rand_vel.py:54-62
        and ant_rand_goal.py:68-77, computed from fake batched samples."""
        from promp_tpu.envs import make_env
        rng = np.random.RandomState(0)
        obs = rng.randn(3, 4, 6, 8).astype(np.float32)
        swimmer = make_env("SwimmerRandVelEnv")
        out = swimmer.diagnostics({
            "observations": jnp.asarray(obs),
            "env_infos": {"reward_fwd": jnp.zeros((3, 4, 6)),
                          "reward_ctrl": jnp.zeros((3, 4, 6))}})
        progs = obs[..., -1, -3] - obs[..., 0, -3]
        np.testing.assert_allclose(out["AverageForwardProgress"],
                                   progs.mean(), rtol=1e-6)
        np.testing.assert_allclose(out["MaxForwardProgress"], progs.max(),
                                   rtol=1e-6)
        np.testing.assert_allclose(out["StdForwardProgress"], progs.std(),
                                   rtol=1e-5)

        fwd = rng.randn(3, 4, 6).astype(np.float32)
        ctrl = rng.rand(3, 4, 6).astype(np.float32)
        ant = make_env("AntRandGoalEnv")
        out = ant.diagnostics({
            "observations": jnp.asarray(obs),
            "env_infos": {"reward_forward": jnp.asarray(fwd),
                          "reward_ctrl": jnp.asarray(-ctrl)}})
        per_path = fwd.mean(-1)
        np.testing.assert_allclose(out["AverageForwardReturn"],
                                   per_path.mean(), rtol=1e-5)
        np.testing.assert_allclose(out["MinForwardReturn"], per_path.min(),
                                   rtol=1e-5)
        np.testing.assert_allclose(out["AverageCtrlCost"],
                                   ctrl.mean(-1).mean(), rtol=1e-5)


class TestPhaseTiming:
    def test_timing_keys_present_and_consistent(self):
        trainer = make_trainer(n_itr=1, timing_every=1)
        metrics, _ = trainer._run_phases(jax.random.PRNGKey(0),
                                         measure=True)
        for k in ("Time-Sampling", "Time-SampleProc", "Time-InnerStep",
                  "Time-OuterStep", "Time-MAMLSteps", "PolicyExecTime",
                  "EnvExecTime"):
            assert k in metrics, k
            assert metrics[k] >= 0.0
        # sampling-time split: policy + env == sampling (by construction)
        np.testing.assert_allclose(
            metrics["PolicyExecTime"] + metrics["EnvExecTime"],
            metrics["Time-Sampling"], rtol=1e-6, atol=1e-9)

    def test_amortized_timing_carries_forward(self, tmp_path):
        """timing_every>1: unmeasured iterations still log the Time-* keys
        (carrying the last measured values) so progress.csv keeps the
        reference's column set every row."""
        logger.configure(dir=str(tmp_path), format_strs=["csv"])
        trainer = make_trainer(n_itr=3, timing_every=2)
        trainer.train()
        rows = list(csv.DictReader(
            open(os.path.join(str(tmp_path), "progress.csv"))))
        assert len(rows) == 3
        for row in rows:
            assert row["Time-SampleProc"] != ""
            assert row["PolicyExecTime"] != ""
        # itr 1 is unmeasured -> carries itr 0's values verbatim. (itr 2
        # is re-measured, but two independent wall-clock measurements can
        # legitimately collide at the logger's string precision, so only
        # the carry-forward equality is asserted.)
        assert rows[1]["Time-Sampling"] == rows[0]["Time-Sampling"]


class TestCompatSampler:
    def test_numpy_stream_determinism(self):
        """The compat sampler must be a pure function of the numpy seed
        (the reproducibility contract of reference test_samplers.py:116)."""
        from promp_tpu.sampling.compat_sampler import CompatPointMassSampler
        policy = GaussianMLPPolicy(obs_dim=2, action_dim=2,
                                   hidden_sizes=(8,))
        params = policy.init(jax.random.PRNGKey(0))
        tp = policy.replicate(params, 3)

        def run():
            s = CompatPointMassSampler(policy, meta_batch_size=3,
                                       envs_per_task=2, max_path_length=5,
                                       seed=22)
            tasks = s.sample_tasks()
            return s.obtain_samples(tp, tasks), tasks

        (d1, t1), (d2, t2) = run(), run()
        for a, b in zip(t1, t2):
            np.testing.assert_array_equal(a, b)
        for p1, p2 in zip(d1, d2):
            np.testing.assert_array_equal(p1["observations"],
                                          p2["observations"])
            np.testing.assert_array_equal(p1["rewards"], p2["rewards"])

    def test_reference_rng_order(self):
        """Task sampling consumes np.random.choice(4, 40) exactly like
        point_env_2d_corner.py:86-87."""
        from promp_tpu.sampling.compat_sampler import CompatPointMassSampler
        policy = GaussianMLPPolicy(obs_dim=2, action_dim=2,
                                   hidden_sizes=(8,))
        s = CompatPointMassSampler(policy, meta_batch_size=5,
                                   envs_per_task=1, max_path_length=2,
                                   seed=7)
        tasks = s.sample_tasks()
        np.random.seed(7)
        idx = np.random.choice(range(4), size=5)
        expected = [s.CORNERS[i] for i in idx]
        for a, b in zip(tasks, expected):
            np.testing.assert_array_equal(a, b)
