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

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "dp"
AXIS_SPATIAL = "sp"


def make_mesh(n_data: int | None = None, n_spatial: int = 1, devices=None) -> Mesh:
    """A (dp, sp) mesh over the available devices.

    Args:
      n_data: size of the data axis; defaults to n_devices // n_spatial.
      n_spatial: size of the spatial axis.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    if n_data * n_spatial > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_spatial} needs more than {len(devices)} devices"
        )
    grid = devices[: n_data * n_spatial].reshape(n_data, n_spatial)
    return Mesh(grid, (AXIS_DATA, AXIS_SPATIAL))


def batch_spec(ndim: int) -> P:
    """PartitionSpec sharding axis 0 (batch) over dp, rest replicated."""
    return P(AXIS_DATA, *([None] * (ndim - 1)))


def constrain(x, mesh: Mesh | None, spec: P):
    """with_sharding_constraint that degrades to a no-op without a mesh."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def spatial_spec(ndim: int, h_axis: int) -> P:
    """Shard batch over dp and the height axis over sp."""
    parts = [None] * ndim
    parts[0] = AXIS_DATA
    parts[h_axis] = AXIS_SPATIAL
    return P(*parts)


def shard_batch(tree, mesh: Mesh):
    """Device-put a host batch with the batch axis sharded over dp."""

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, batch_spec(np.ndim(x))))

    return jax.tree_util.tree_map(put, tree)
