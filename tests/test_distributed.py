"""Multi-PROCESS distribution test (SURVEY.md §2.9 P5; VERDICT r3 item 3).

Launches two real OS processes that `jax.distributed.initialize` against a
localhost coordinator (CPU backend, one device each), build the task-axis
mesh over the 2-device GLOBAL device set, and run one fused ProMP
meta-iteration — the actual multi-host code path (parallel/mesh.py:62-75),
not the single-process virtual mesh. Asserts:

  * both processes see process_count=2 and complete with identical losses;
  * the result matches a single-process run of the same 2-device SPMD
    program (virtual devices) — distribution changes the runtime, not the
    computation;
  * per-process log files get the `-rankNNN` suffix, the analog of the
    reference's MPI rank suffixing (reference utils/logger.py:411-427).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(num_processes, process_id, port, out, logdir, mesh_size=None):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    # sys.path[0] of a script run is its own directory (tests/), so the
    # worker needs the repo root explicitly — don't rely on the parent
    # environment happening to carry it.
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, WORKER,
         "--process-id", str(process_id),
         "--num-processes", str(num_processes),
         "--port", str(port),
         "--mesh-size", str(mesh_size if mesh_size else (num_processes if num_processes > 1 else 2)),
         "--out", out, "--logdir", logdir],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)


def test_two_process_fused_iteration_matches_single(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"proc{i}.json") for i in range(2)]
    logdir = str(tmp_path / "logs")
    procs = [_spawn(2, i, port, outs[i], logdir) for i in range(2)]
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        assert p.returncode == 0, stdout.decode()[-3000:]

    results = [json.load(open(o)) for o in outs]
    for r in results:
        assert r["process_count_seen"] == 2
        assert r["device_count"] == 2
        assert r["local_device_count"] == 1
    # both processes computed the same global program. Bitwise equality
    # holds on today's CPU collectives; fall back to a tight allclose so
    # a future runtime's reduction-order change reads as a real diff,
    # not a flake (r5 ADVICE item).
    for key in ("LossAfter", "params_sum"):
        a, b = results[0][key], results[1][key]
        if a != b:
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8,
                                       err_msg=key)

    # per-process rank suffix fired (reference MPI-rank analog)
    assert os.path.exists(os.path.join(logdir, "progress-rank000.csv"))
    assert os.path.exists(os.path.join(logdir, "progress-rank001.csv"))

    # single-process run of the same 2-device SPMD program
    single_out = str(tmp_path / "single.json")
    p = _spawn(1, 0, _free_port(), single_out, str(tmp_path / "logs1"))
    stdout, _ = p.communicate(timeout=600)
    assert p.returncode == 0, stdout.decode()[-3000:]
    single = json.load(open(single_out))
    # same partitioned computation; runtimes differ (cross-process
    # collectives vs intra-process), so allclose rather than bitwise
    np.testing.assert_allclose(results[0]["LossAfter"],
                               single["LossAfter"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(results[0]["params_sum"],
                               single["params_sum"], rtol=1e-5, atol=1e-6)
    # single-process files carry no rank suffix
    assert os.path.exists(os.path.join(str(tmp_path / "logs1"),
                                       "progress.csv"))


def test_four_process_fused_iteration(tmp_path):
    """4 real OS processes, 4-device global mesh (VERDICT r4 item 8:
    scale the real multi-process evidence beyond 2)."""
    port = _free_port()
    outs = [str(tmp_path / f"proc{i}.json") for i in range(4)]
    logdir = str(tmp_path / "logs4")
    procs = [_spawn(4, i, port, outs[i], logdir) for i in range(4)]
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        assert p.returncode == 0, stdout.decode()[-3000:]
    results = [json.load(open(o)) for o in outs]
    for r in results:
        assert r["process_count_seen"] == 4
        assert r["device_count"] == 4
        assert r["local_device_count"] == 1
    for key in ("LossAfter", "params_sum"):
        vals = [r[key] for r in results]
        np.testing.assert_allclose(vals, vals[0], rtol=1e-6, atol=1e-8,
                                   err_msg=key)
    for i in range(4):
        assert os.path.exists(
            os.path.join(logdir, f"progress-rank{i:03d}.csv"))

    # the same 4-device SPMD program, single process
    single_out = str(tmp_path / "single4.json")
    p = _spawn(1, 0, _free_port(), single_out, str(tmp_path / "logs41"),
               mesh_size=4)
    stdout, _ = p.communicate(timeout=900)
    assert p.returncode == 0, stdout.decode()[-3000:]
    single = json.load(open(single_out))
    np.testing.assert_allclose(results[0]["LossAfter"],
                               single["LossAfter"], rtol=1e-5, atol=1e-6)
