"""Device mesh + sharding helpers.

TPU-native replacement for the reference's four data-parallel mechanisms
(SURVEY.md §2.8 P1-P6): one ``jax.sharding.Mesh``, `NamedSharding`
annotations, and XLA collectives over ICI. There is no rendezvous code to
port — ``jax.distributed.initialize()`` covers multi-host, and single-host
multi-chip needs nothing at all.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def device_mesh(axis_names: Sequence[str] = ("dp",), shape: Sequence[int] | None = None, devices=None) -> Mesh:
    """Build a mesh over all (or the given) devices.

    ``device_mesh()`` → 1-D data-parallel mesh over every chip;
    ``device_mesh(("dp","tp"), (2,4))`` → 2-D mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def data_shard(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis across ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Device-put a host batch with its leading axis sharded over the mesh."""
    sh = data_shard(mesh, axis)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def dp_shard_fn(fn, mesh: Mesh, axis: str = "dp"):
    """Wrap ``fn(*arrays) -> array`` so each device runs it on its shard of
    the leading (batch) axis — the composition that lets a Pallas-backed
    ε-net (which GSPMD cannot partition) ride a dp mesh inside any larger
    jitted graph (certify chains, attack gradients). ``shard_map`` is
    differentiable, so ``jax.grad`` through the wrapped fn yields per-shard
    cotangents with no extra collectives (batch elements are independent).

    Closed-over params inside ``fn`` must be replicated across the mesh.
    Batch dims must divide the mesh axis size.
    """
    from jax import shard_map

    wrapped = shard_map(
        fn, mesh=mesh,
        in_specs=P(axis), out_specs=P(axis),
        check_vma=False,
    )
    return wrapped
