"""FeCo feature-level compression defense
(reference ``transforms/feature_defense.py``).

Compress a (num_frames, dim) acoustic-feature sequence by clustering frames
and re-averaging members (differentiable). ``kmeans`` runs on device as a
fixed-iteration Lloyd scan vmapped over the batch; ``warped_kmeans`` (with
TS/random boundary init) is the reference's sequential boundary-moving
algorithm — inherently serial, kept on host in numpy.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmeans import differentiable_compress, kmeans as _kmeans


def kmeans_compress(feat: jnp.ndarray, ratio: float = 0.5, distance: str = "L2", n_iters: int = 20) -> jnp.ndarray:
    """feat (n, d) → (k, d) with k = int(n·ratio)."""
    n = feat.shape[0]
    k = int(n * ratio)
    assign, _ = _kmeans(feat, k, n_iters=n_iters, distance=distance)
    return differentiable_compress(feat, assign, k)


def _ts_boundaries(feat: np.ndarray, k: int) -> np.ndarray:
    """Trajectory-segmentation boundary init (reference ``TS``, ``:69-96``)."""
    n = feat.shape[0]
    dist = np.zeros(n)
    for i in range(1, n):
        dist[i] = dist[i - 1] + np.linalg.norm(feat[i] - feat[i - 1])
    seg = dist[-1] / k
    boundary = [0]
    index = 0
    for j in range(1, k):
        need = seg * j
        while index < n and (need > dist[index] or index in boundary):
            index += 1
        boundary.append(index)
    boundary = np.asarray(boundary)
    over = np.where(boundary == n)[0]
    for i, idx in enumerate(over):
        boundary[idx] = n - len(over) + i
    for i in range(int(over[0]) - 1 if len(over) else -1, 1, -1):
        if boundary[i] >= boundary[i + 1]:
            boundary[i] = boundary[i + 1] - 1
        else:
            break
    return boundary


def warped_kmeans_compress(feat: np.ndarray, ratio: float = 0.5, delta: float = 0.0, init: str = "random", rng=None) -> np.ndarray:
    """Sequence-respecting k-means (reference ``wk_compute``, ``:131-170``):
    move boundary frames between adjacent segments while ΔSQE < 0."""
    feat = np.asarray(feat, dtype=np.float64)
    n, d = feat.shape
    k = int(n * ratio)
    if init == "ts":
        boundary = _ts_boundaries(feat, k)
    else:
        rng = rng or np.random.default_rng(0)
        boundary = np.concatenate([[0], np.sort(rng.choice(np.arange(1, n), size=k - 1, replace=False))])
    boundary = boundary.astype(int)

    bpad = np.concatenate([boundary, [n]])
    means = np.stack([feat[bpad[i] : bpad[i + 1]].mean(0) for i in range(k)])
    counts = (bpad[1:] - bpad[:-1]).astype(float)

    def dsqe(x, mj, ml, cj, cl):
        return np.sum((x - ml) ** 2) * cl / (cl + 1) - np.sum((x - mj) ** 2) * cj / (cj - 1)

    changed = True
    while changed:
        changed = False
        for i in range(k):
            if i > 0:
                begin = boundary[i]
                end = begin + math.floor(counts[i] / 2 * (1 - delta))
                for j in range(begin, int(end)):
                    dq = dsqe(feat[j], means[i], means[i - 1], counts[i], counts[i - 1])
                    if counts[i] > 1 and dq < 0:
                        changed = True
                        boundary[i] += 1
                        counts[i] -= 1
                        counts[i - 1] += 1
                        means[i] -= (feat[j] - means[i]) / counts[i]
                        means[i - 1] += (feat[j] - means[i - 1]) / counts[i - 1]
                    else:
                        break
            if i < k - 1:
                end = boundary[i + 1] - 1
                begin = end - math.floor(counts[i] / 2 * (1 - delta))
                for j in range(int(end), int(begin), -1):
                    dq = dsqe(feat[j], means[i], means[i + 1], counts[i], counts[i + 1])
                    if counts[i] > 1 and dq < 0:
                        changed = True
                        boundary[i + 1] -= 1
                        counts[i] -= 1
                        counts[i + 1] += 1
                        means[i] -= (feat[j] - means[i]) / counts[i]
                        means[i + 1] += (feat[j] - means[i + 1]) / counts[i + 1]
                    else:
                        break
    return means.astype(np.float32)


def FEATURE_COMPRESSION(feat, method: str = "kmeans", param: float = 0.5, other_param: str = "L2"):
    """feat (batch, num_frames, dim) → (batch, k, dim)."""
    if method == "kmeans":
        return jax.vmap(lambda f: kmeans_compress(f, ratio=param, distance="cos" if other_param == "cos" else "L2"))(
            jnp.asarray(feat)
        )
    if method == "warped_kmeans":
        outs = [warped_kmeans_compress(np.asarray(f), ratio=param, init=other_param) for f in np.asarray(feat)]
        return jnp.asarray(np.stack(outs))
    raise NotImplementedError("Currently FEATURE COMPRESSION only supports kmeans and warped_kmeans")


class FeCo:
    def __init__(self, method: str = "kmeans", param: float = 0.5, other_param: str = "L2"):
        self.method = method
        self.param = param
        self.other_param = other_param
        self.stochastic = False

    def __call__(self, feat, rng=None):
        return FEATURE_COMPRESSION(feat, self.method, self.param, self.other_param)

    def _get_name(self):
        return f"FeCo-{self.method}-{self.param}-{self.other_param}"
