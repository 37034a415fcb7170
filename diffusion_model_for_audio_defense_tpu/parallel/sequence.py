"""Sequence parallelism for long waveforms.

Beyond-reference capability (SURVEY.md §5.7 notes it as the natural
extension): the reference caps audio at 1 s / 16000 samples per GPU
(``transforms_wav.py:34-48``), so longer utterances simply don't fit its
pipeline. Here the waveform TIME axis is sharded across a mesh axis and the
dilated convolutions run under GSPMD, which lowers each kernel-3 dilation-d
conv to a ``collective-permute`` halo exchange of exactly ``d`` samples with
the neighboring chips — no gathers, no replication of the sequence.

Measured on the 8-device test mesh (tests/test_parallel_sp.py): the full
WaveNet forward partitions into per-layer collective-permutes with ZERO
all-gathers, bit-matching the unsharded forward. Communication per layer is
O(d·C) on ICI vs O(L·C) compute, so scaling efficiency stays high until
dilation approaches the per-chip shard length L/n.

Usage::

    mesh = device_mesh(("sp",))
    fwd = make_sp_forward(model.apply, mesh)   # jitted, halo-exchanging
    eps = fwd(variables, x, t)                 # x (B, 1, L) with L sharded

The same annotation composes with dp: ``device_mesh(("dp","sp"), (a,b))``
and ``PartitionSpec("dp", None, "sp")`` shards batch AND time.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sequence_sharding(mesh: Mesh, axis: str = "sp", batch_axis: Optional[str] = None) -> NamedSharding:
    """Sharding for waveforms ``(B, 1, L)``: time over ``axis``, optionally
    batch over ``batch_axis``."""
    return NamedSharding(mesh, P(batch_axis, None, axis))


def make_sp_forward(
    model_apply: Callable,
    mesh: Mesh,
    axis: str = "sp",
    batch_axis: Optional[str] = None,
):
    """Jit ``model_apply(variables, x, t)`` with the time axis of ``x`` (and
    of the output) sharded over ``mesh[axis]``; params replicated (or
    pre-sharded by the caller — GSPMD respects explicit placements).

    XLA's SPMD partitioner inserts the halo exchanges the dilated convs
    need; nothing model-side changes (this is the whole point of building
    the models as plain sharding-agnostic functions). Only the waveform's
    sharding is pinned — params and t keep whatever placement the caller
    gave them (replicated, or tp-sharded for sp×tp composition).
    """
    wave = sequence_sharding(mesh, axis, batch_axis)
    return jax.jit(
        model_apply,
        in_shardings=(None, wave, None),
        out_shardings=wave,
    )


def shard_waveform(mesh: Mesh, x, axis: str = "sp", batch_axis: Optional[str] = None):
    """Device-put a host waveform batch with its time axis sharded."""
    return jax.device_put(x, sequence_sharding(mesh, axis, batch_axis))
