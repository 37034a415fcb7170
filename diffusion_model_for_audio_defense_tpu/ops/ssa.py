"""Singular Spectrum Analysis (SSA) — host-side numpy.

Rebuild of ``robustness_eval/_ssa_core.py``: Hankel trajectory matrix →
SVD → reconstruction from the top-k components by anti-diagonal averaging.
The reference pins this to CPU (``_ssa_core.py:28``) because the
13001×3000 SVD OOMs on accelerator; it is off the hot path (computed once
per utterance and recycled across the Kenansville binary search), so this
stays numpy/scipy on host by design.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg as la


def ssa(y: np.ndarray, dim: int):
    """Decompose series ``y (n,)`` with window ``dim``.

    Returns (pc, s, v): principal components ``(t, dim)``, singular values,
    right singular vectors ``(dim, dim)`` with components in columns.
    """
    y = np.asarray(y, dtype=np.float64).ravel()
    n = len(y)
    t = n - (dim - 1)
    yy = la.hankel(y, np.zeros(dim))[: -dim + 1, :] / np.sqrt(t)
    _, s, vh = np.linalg.svd(yy, full_matrices=False)
    v = vh.T
    pc = yy @ v
    return pc, s, v


def inv_ssa(pc: np.ndarray, v: np.ndarray, k) -> np.ndarray:
    """Reconstruct the series from components ``k`` (anti-diagonal average)."""
    k = np.atleast_1d(k)
    t, dim = pc.shape
    n_points = t + dim - 1
    pc_comp = pc[:, k] @ v[:, k].T  # (t, dim)
    xr = np.zeros(n_points)
    rows = np.arange(t)[:, None] + np.arange(dim)[None, :]
    np.add.at(xr, rows.ravel(), pc_comp.ravel())
    counts = np.concatenate(
        [np.arange(1, dim + 1), np.full(n_points - 2 * dim, dim), np.arange(dim, 0, -1)]
    )
    return (xr / counts) * np.sqrt(t)
