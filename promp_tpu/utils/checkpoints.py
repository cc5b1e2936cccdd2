"""Checkpoint / resume: pickled pytree snapshots with mode policies.

Analog of the reference's snapshot machinery (reference:
meta_policy_search/utils/logger.py:376-396 ``save_itr_params`` +
utils/serializable.py ctor-capture pickling + meta_trainer.py:30-33
resume path). A snapshot is a plain dict of numpy pytrees — train_state
(params + inner step sizes), optimizer state, hparams, RNG key, iteration
counter and the static config — exactly the state needed to resume
bit-identically.

Writes are atomic (tmp + rename) so a preempted run never leaves a torn
snapshot; ``latest``/history utilities support the last/all/gap/last_gap
modes.
"""
from __future__ import annotations

import os
import pickle
import tempfile


def save_snapshot(path, snapshot):
    """Atomic pickle write."""
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(snapshot, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_snapshot(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def latest_snapshot(run_dir):
    """Find the most recent snapshot in a run directory (params.pkl or the
    highest-numbered itr_N.pkl)."""
    last = os.path.join(run_dir, "params.pkl")
    if os.path.exists(last):
        return last
    best_itr, best = -1, None
    for name in os.listdir(run_dir):
        if name.startswith("itr_") and name.endswith(".pkl"):
            try:
                itr = int(name[4:-4])
            except ValueError:
                continue
            if itr > best_itr:
                best_itr, best = itr, os.path.join(run_dir, name)
    return best


def resume_trainer(trainer, run_dir):
    """Restore a Trainer from the latest snapshot in ``run_dir``
    (meta_trainer.py:55-57 resume semantics). Returns the start iteration."""
    path = latest_snapshot(run_dir)
    if path is None:
        return 0
    snapshot = load_snapshot(path)
    trainer.restore(snapshot)
    return trainer.start_itr
