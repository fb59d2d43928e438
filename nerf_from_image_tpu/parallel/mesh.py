"""Device mesh + sharding helpers (the TPU answer to nn.DataParallel).

The reference's only parallelism axis is single-host data parallelism via
torch DataParallel (/root/reference/run.py:636-644). Here the same axis is
a `jax.sharding.Mesh` over ICI: parameters replicated, batch sharded on
'data'; gradient reduction is the psum XLA inserts for the pjit-sharded
loss. Rays within an image are a second (optional) sharding axis for
large renders — see shard_rays.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(mesh_shape: str = '', devices=None) -> Mesh:
    """Creates a mesh; default = all devices on one 'data' axis.

    mesh_shape syntax: "data:4,rays:2" (row-major over jax.devices()).
    """
    devices = devices if devices is not None else jax.devices()
    if not mesh_shape:
        return Mesh(np.asarray(devices), ('data',))
    names, dims = [], []
    for part in mesh_shape.split(','):
        name, dim = part.split(':')
        names.append(name.strip())
        dims.append(int(dim))
    arr = np.asarray(devices[:int(np.prod(dims))]).reshape(dims)
    return Mesh(arr, tuple(names))


def replicate(tree, mesh: Mesh):
    """Replicates a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree, mesh: Mesh, axis_name: str = 'data'):
    """Shards every leaf's leading (batch) axis across `axis_name`."""
    def put(x):
        spec = P(axis_name) if getattr(x, 'ndim', 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def batch_spec(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rays(tree, mesh: Mesh, axis_name: str = 'rays'):
    """Shards the ray (image-row) axis of render-shaped arrays.

    Rays are embarrassingly parallel (SURVEY §5): for large single-image
    renders the H axis of (B, H, W, ...) tensors is sharded over
    `axis_name` so each device evaluates a horizontal strip; the only
    cross-device communication is the output gather XLA inserts.
    Leaves with <2 dims are replicated.
    """
    if axis_name not in mesh.axis_names:
        raise ValueError(f'mesh has no axis {axis_name!r}; '
                         f'create it via create_mesh("data:D,rays:R")')

    def put(x):
        if getattr(x, 'ndim', 0) >= 2:
            spec = P('data' if 'data' in mesh.axis_names else None, axis_name)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def ray_spec(mesh: Mesh, axis_name: str = 'rays') -> NamedSharding:
    """Sharding for (B, H, W, ...) tensors: batch on 'data', rows on rays."""
    return NamedSharding(
        mesh, P('data' if 'data' in mesh.axis_names else None, axis_name))
