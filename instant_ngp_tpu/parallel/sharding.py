"""Data-parallel training / rendering over a device mesh.

TPU-native replacement for the reference's multi-GPU render fan-out
(SURVEY.md §2.11-5): parameters + occupancy bitfield are replicated
(ICI broadcast — the analog of `sync_device`'s peer-to-peer copies),
ray/pixel batches are sharded along the mesh's data axis, and the
gradient all-reduce (psum) rides ICI. The same program runs multi-host
over DCN via jax.distributed.initialize.

Implementation: shard_map over the ray axis computes local grads, psums
them, and every device applies an identical optimizer update — so
params stay replicated without further traffic.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def dp_value_and_grad(loss_fn: Callable, mesh: Mesh, axis_name: str = "data"):
    """Build a data-parallel value_and_grad of ``loss_fn(params, batch)``.

    ``batch`` is a pytree whose leaves have a leading ray/sample axis
    divisible by the mesh size. Returns mean loss and psum-averaged
    grads, both replicated.
    """

    def local(params, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        loss = jax.lax.pmean(loss, axis_name)
        grads = jax.lax.pmean(grads, axis_name)
        return loss, grads

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch onto the mesh sharded along the leading axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def dp_render(render_fn: Callable, mesh: Mesh, axis_name: str = "data"):
    """Shard a per-ray render function (params, grid, o, d) → rgb/alpha/
    depth across the mesh: pixels sharded, model state replicated —
    the TPU version of view-parallel multi-GPU rendering."""

    def local(params, grid_bits, o, d):
        return render_fn(params, grid_bits, o, d)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name), P(axis_name)),
        check_vma=False,
    )
