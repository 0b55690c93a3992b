"""Device mesh + sharding helpers for multi-chip scenario batches.

The reference has no data/model parallelism — its concurrency is a thread
pool inside one solver plus a ROS process split (SURVEY.md §2.8). The TPU
framework's headline scaling axis is the *scenario batch*: thousands of MPC
instances (gait x terrain x command grids) solved simultaneously, sharded
over a ``jax.sharding.Mesh`` so each chip holds batch/n_devices solves.
The horizon and stage loops stay on-chip; no cross-device communication is
needed inside a solve, so scaling is embarrassingly parallel over ICI with
collectives only for metric reductions (psum of solve counters / residuals).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "batch") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Multi-host runtime init (`jax.distributed.initialize`): hosts meet at
    the coordinator over DCN, after which ``jax.devices()`` is the *global*
    device list and a mesh built from it spans hosts. The role the reference
    fills with ROS networking (SURVEY.md §2.8) for its process split; here it
    is the scaling fabric for the scenario batch. Returns the process index.

    No-op (returns 0) when called without arguments in a single-process
    setting — callers can use it unconditionally."""
    if coordinator_address is None and num_processes is None:
        return 0
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index()


def make_global_mesh(axis_name: str = "batch") -> Mesh:
    """1-D mesh over ALL devices of ALL processes (multi-host: requires
    initialize_distributed first). Identical to make_mesh on one host."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def host_local_batch_to_global(mesh: Mesh, tree, axis_name: str = "batch"):
    """Assemble a global batch-sharded array from per-process local shards
    (each process supplies batch/num_processes rows) — the multi-host feed
    path: observations are produced host-locally, solved globally."""
    sharding = NamedSharding(mesh, P(axis_name))

    def one(x):
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x,
                                                      global_shape)

    return jax.tree.map(one, tree)


def shard_batch(mesh: Mesh, tree, axis_name: str = "batch"):
    """Place a batched pytree with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(tree, sharding)


def sharded_batch_solver(solve_one: Callable, mesh: Mesh,
                         axis_name: str = "batch",
                         static_argnums: Sequence[int] = ()) -> Callable:
    """vmap + jit a per-instance solver with batch-axis sharding constraints.

    ``solve_one(*args)`` is the single-scenario solver; the returned function
    takes leading-batch-axis args (batch divisible by mesh size), constrains
    inputs and outputs to be batch-sharded, and lets XLA run each shard's
    solves locally — ICI traffic only at the caller's reductions.
    """
    batched = jax.vmap(solve_one)
    sharding = NamedSharding(mesh, P(axis_name))

    def fn(*args):
        args = jax.tree.map(lambda a: jax.lax.with_sharding_constraint(
            a, sharding), args)
        out = batched(*args)
        return jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(a, sharding), out)

    return jax.jit(fn, static_argnums=tuple(static_argnums))
