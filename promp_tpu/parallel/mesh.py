"""Device mesh + sharding utilities for multi-chip / multi-host scaling.

TPU-native replacement for the reference's process-based distribution
(reference: meta_policy_search/samplers/vectorized_env_executor.py:88-234
one OS process per meta-task over multiprocessing.Pipe; SURVEY.md §2.9
P1/P4/P5). The distribution story here is the BASELINE.json north-star
decomposition: the meta-task (and env) axes are data axes sharded over the
mesh, the learner is replicated, and XLA inserts ``psum``s over ICI for the
outer-step reductions when the task axis is sharded.

Everything routes through ``jax.sharding`` + sharding constraints under
``jit`` — no hand-written collectives are needed for the MLP-scale policy
(no tensor/pipeline parallel axes exist in this workload; SURVEY.md §2.9).
Multi-host init wraps ``jax.distributed.initialize`` (the analog of the
reference's MPI awareness, utils/logger.py:411-414).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "task",
              backend: Optional[str] = None):
    """1-D device mesh over the task axis (the only parallel axis that
    matters for meta-RL rollouts; envs-per-task stay local).

    Falls back to the CPU backend when the default backend has fewer than
    ``n_devices`` devices (the virtual-mesh test setup)."""
    devices = jax.devices(backend) if backend else jax.devices()
    if n_devices is not None and len(devices) < n_devices:
        try:
            cpu = jax.devices("cpu")
        except Exception:
            cpu = []
        if len(cpu) >= n_devices:
            devices = cpu
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def task_sharding(mesh: Mesh, axis_name: str = "task"):
    """NamedSharding that shards the LEADING (task) axis of every leaf."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_task_batch(tree, mesh: Mesh, axis_name: str = "task"):
    """device_put a pytree with its leading axis split across the mesh."""
    return jax.device_put(tree, task_sharding(mesh, axis_name))


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Multi-host runtime bring-up (SURVEY.md §2.9 P5).

    On single-host runs this is a no-op; on pods it must be called before
    any jax API, mirroring `jax.distributed.initialize` requirements.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
