"""Device mesh construction and sharding specs.

The scaling strategy (SURVEY.md §2.8): the reference's only parallelism
is NCCL data-parallel (DDP, reference model.py:55, tools.py:317).  Here
distribution is expressed once, as shardings over a 2-axis logical mesh,
and XLA GSPMD inserts the collectives:

* ``dp`` — data parallel: batch axis.  Gradient reduction and the
  cross-replica batch-norm statistics (the reference needs
  SyncBatchNorm for this, model.py:36-37) fall out of jit over sharded
  batches — reductions over a sharded axis are global automatically.
* ``sp`` — spatial parallel: the image-height axis of feature maps /
  cost volumes for single-sample inference at large resolutions; XLA
  partitions convolutions spatially with halo exchange.

Collectives ride ICI inside a slice; host-side data loading is sharded
by ``jax.process_index()`` (see data.loader).
"""

from __future__ import annotations

import logging

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "dp"
AXIS_SPATIAL = "sp"
AXIS_VIEW = "vp"


def make_mesh(
    n_data: int | None = None, n_spatial: int = 1, n_view: int = 1, devices=None
) -> Mesh:
    """A (dp[, vp], sp) mesh over the available devices.

    Args:
      n_data: size of the data axis; defaults to the remaining devices.
      n_spatial: size of the spatial axis.
      n_view: size of the source-view axis (cost-volume correlations are
        summed over V-1 source views; vp shards that sum, SURVEY §2.8).
        The vp axis only exists when n_view > 1 so 2-axis callers are
        unaffected.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_spatial * n_view)
    total = n_data * n_spatial * n_view
    if total > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_view}x{n_spatial} needs more than "
            f"{len(devices)} devices"
        )
    if n_view > 1:
        grid = devices[:total].reshape(n_data, n_view, n_spatial)
        return Mesh(grid, (AXIS_DATA, AXIS_VIEW, AXIS_SPATIAL))
    grid = devices[:total].reshape(n_data, n_spatial)
    return Mesh(grid, (AXIS_DATA, AXIS_SPATIAL))


def batch_spec(ndim: int) -> P:
    """PartitionSpec sharding axis 0 (batch) over dp, rest replicated."""
    return P(AXIS_DATA, *([None] * (ndim - 1)))


def constrain(x, mesh: Mesh | None, spec: P):
    """with_sharding_constraint that degrades to a no-op without a mesh.

    Also a no-op when a constrained axis doesn't divide over its mesh
    axis — this happens when the model is traced with a HOST-LOCAL batch
    (param init in a multi-process run traces with batch/process_count
    samples) and the constraint will hold for the real global arrays.
    """
    if mesh is None:
        return x
    for axis, name in enumerate(spec):
        if name is not None and x.shape[axis] % mesh.shape[name]:
            logging.debug(
                "sharding constraint %s dropped: axis %d of shape %s does "
                "not divide mesh axis %r=%d", spec, axis, x.shape, name,
                mesh.shape[name],
            )
            return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def spatial_spec(ndim: int, h_axis: int) -> P:
    """Shard batch over dp and the height axis over sp."""
    parts = [None] * ndim
    parts[0] = AXIS_DATA
    parts[h_axis] = AXIS_SPATIAL
    return P(*parts)


def replicate_tree(tree, mesh: Mesh):
    """Make a host-local pytree (params / train state) a GLOBAL,
    fully-replicated array tree over the mesh.

    Needed in multi-process runs: jit over a multi-host mesh requires
    every array input to be a global jax.Array; process-local arrays
    (e.g. freshly initialized params, identical on every process by
    seeding) are lifted with host_local_array_to_global_array.  A no-op
    for a single process (jit replicates automatically).
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(
        jax.tree_util.tree_map(np.asarray, tree), mesh, P()
    )


def shard_batch(tree, mesh: Mesh):
    """Assemble a host-local batch into GLOBAL arrays sharded over dp.

    Single process: a plain device_put with the batch axis split over the
    dp mesh axis.  Multi-process (the reference's DDP regime,
    reference tools.py:299-322): every process holds only its local shard
    of the global batch (the loader shards samples by process_index), so
    the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the local batch axis is
    1/process_count of the global one.  Requires the dp axis to span
    processes uniformly (the standard contiguous device-to-process map).
    """
    n_proc = jax.process_count()

    def put(x):
        sharding = NamedSharding(mesh, batch_spec(np.ndim(x)))
        if n_proc == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(put, tree)
