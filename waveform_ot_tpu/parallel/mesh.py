"""Device-mesh sharding for batched misfit pipelines.

The reference is single-process NumPy (SURVEY.md 2.5 — no parallelism of
any kind); its scaling axis is the embarrassingly parallel (receiver,
component) trace batch. The TPU-native equivalents here:

  * data-parallel traces: shard the flattened trace axis of the batched
    pipeline across a 1-D ``jax.sharding.Mesh``; the summed misfit and its
    gradient ride a single ``psum`` over ICI (``shard_map`` path), or are
    partitioned automatically by XLA (GSPMD path via sharding-annotated
    inputs — both are provided, they compile to the same collectives).
  * model parameters (3-9 scalars) are replicated; forward physics is tiny
    and runs replicated, so the only cross-chip traffic is the final misfit
    reduction and the parameter-gradient psum.

Tested on a virtual 8-device CPU mesh (tests/test_parallel.py) and exercised
multi-chip by ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import functools
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "batch") -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices (default all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_leading_axis(tree, mesh: Mesh, axis_name: str = "batch"):
    """Place a pytree on the mesh: arrays whose leading dim is divisible by
    the mesh size are sharded along it, everything else is replicated."""
    n = mesh.devices.size
    batch = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def place(a):
        a = jnp.asarray(a)
        if a.ndim > 0 and a.shape[0] % n == 0 and a.shape[0] >= n:
            return jax.device_put(a, batch)
        return jax.device_put(a, repl)

    return jax.tree_util.tree_map(place, tree)


def replicate(tree, mesh: Mesh):
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(jnp.asarray(a),
                                                           repl), tree)


def sharded_sum(per_item_fn: Callable, mesh: Mesh,
                axis_name: str = "batch") -> Callable:
    """shard_map a batched reduction: f(batch_pytree, *replicated) ->
    sum over the full batch of per_item_fn(item, *replicated).

    The batch pytree's leading axis is sharded over the mesh; each device
    vmaps its local shard and a single ``psum`` over ``axis_name`` produces
    the replicated total. Differentiable (grad of psum is replicated-sum).
    """

    def local(batch, *rest):
        vals = jax.vmap(lambda item: per_item_fn(item, *rest))(batch)
        total = jax.tree_util.tree_map(jnp.sum, vals)
        return jax.tree_util.tree_map(
            lambda v: jax.lax.psum(v, axis_name), total)

    def wrapper(batch, *rest):
        f = jax.shard_map(
            functools.partial(local, *()),
            mesh=mesh,
            in_specs=(P(axis_name),) + (P(),) * len(rest),
            out_specs=P(),
        )
        return f(batch, *rest)

    return wrapper


def sharded_map(per_item_fn: Callable, mesh: Mesh,
                axis_name: str = "batch") -> Callable:
    """shard_map an embarrassingly parallel map: f(batch, *replicated) ->
    per-item outputs, leading axis sharded like the input.

    This is the multi-chip form of the reference's two most expensive
    workloads (SURVEY.md 3.5): the misfit-surface grid scan (1,764 serial
    objective evaluations in Figs_9_10_11 cell 64) and the 64-start repeat
    study (Fig_12 cell 46). Each device vmaps its local shard of the
    model-node/start axis; there is no cross-chip communication at all —
    outputs stay sharded until the caller gathers them.
    """

    def local(batch, *rest):
        return jax.vmap(lambda item: per_item_fn(item, *rest))(batch)

    def wrapper(batch, *rest):
        f = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name),) + (P(),) * len(rest),
            out_specs=P(axis_name),
        )
        return f(batch, *rest)

    return wrapper


def pjit_batched_misfit(misfit_fn: Callable, mesh: Mesh,
                        axis_name: str = "batch") -> Callable:
    """GSPMD path: jit a misfit over inputs already placed with
    :func:`shard_leading_axis`; XLA partitions the vmapped pipeline and
    inserts the reduction collectives automatically."""
    out_s = NamedSharding(mesh, P())
    return jax.jit(misfit_fn, out_shardings=out_s)
