"""Hyperparameter sweep launcher.

TPU-native analog of the reference's doodad-based sweep machinery
(reference: experiment_utils/run_sweep.py:14-53 — local / docker / EC2
modes over a cartesian product of sweep params). Cloud scheduling backends
are deliberately out of scope; the modes map to the TPU world as:

  * ``serial``    — run every variant in-process, one after another
                    (the analog of ``run_sweep_serial``)
  * ``subprocess``— one fresh Python process per variant (isolated XLA
                    state/compile caches; the analog of local_docker)
  * dry-run listing for external schedulers (print variant configs as
    JSON lines, to feed xmanager/borg-style launchers)

Variants get ``<exp_name>/<variant-slug>`` log dirs and full params.json
provenance, like the reference's per-variant output mounts.
"""
from __future__ import annotations

import hashlib
import itertools
import json
import os
import subprocess
import sys
import tempfile


def variant_dicts(sweep_params):
    """Cartesian product of sweep lists -> list of config dicts
    (reference hyper_sweep semantics)."""
    keys = list(sweep_params.keys())
    out = []
    for values in itertools.product(*[sweep_params[k] for k in keys]):
        out.append(dict(zip(keys, values)))
    return out


def _slug(variant):
    blob = json.dumps(variant, sort_keys=True, default=str)
    return hashlib.md5(blob.encode()).hexdigest()[:8]


def run_sweep(run_experiment, sweep_params, exp_name, base_config=None,
              mode="serial", data_dir="data", python_entry=None):
    """Run (or list) every variant of a sweep.

    Args:
        run_experiment: callable(config, dump_path) — typically
            promp_tpu.run.run_experiment.
        sweep_params: dict key -> list of values to sweep.
        exp_name: sweep name; variants land in
            ``<data_dir>/<exp_name>/<slug>``.
        base_config: config defaults merged under each variant.
        mode: 'serial' | 'subprocess' | 'list'.
        python_entry: script path for subprocess mode; it must accept
            ``--config_file`` and ``--dump_path`` (all bundled run_scripts
            do).
    """
    variants = variant_dicts(sweep_params)
    results = []
    for variant in variants:
        config = dict(base_config or {})
        config.update(variant)
        dump_path = os.path.join(data_dir, exp_name, _slug(variant))
        if mode == "list":
            print(json.dumps({"config": config, "dump_path": dump_path},
                             default=str))
            continue
        if mode == "serial":
            results.append(run_experiment(config, dump_path=dump_path))
        elif mode == "subprocess":
            assert python_entry, "subprocess mode needs python_entry"
            with tempfile.NamedTemporaryFile(
                    "w", suffix=".json", delete=False) as f:
                json.dump(config, f, default=str)
                cfg_path = f.name
            subprocess.run(
                [sys.executable, python_entry, "--config_file", cfg_path,
                 "--dump_path", dump_path],
                check=True)
        else:
            raise NotImplementedError(f"sweep mode {mode!r}")
    return results
