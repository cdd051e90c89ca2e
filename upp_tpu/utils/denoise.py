"""Auxiliary patch-based score denoiser utilities (reference
``utils/denoise.py`` — imported nowhere in the main flow, kept for API
parity). The denoiser model is any object with a
``denoise_langevin_dynamics(patches, step_size, denoise_knn, step_decay,
num_steps)`` method; the patch extraction / reassembly here is TPU-native
(our FPS + kNN ops instead of torch_cluster / pytorch3d)."""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fps import fps
from ..ops.knn import knn_points


def farthest_point_sampling(pcls: jnp.ndarray, num_pnts: int
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sampled [B, num_pnts, 3], idx [B, num_pnts]) — deterministic start
    (reference uses random_start=False)."""
    return fps(pcls, num_pnts)


def normalize_unit_sphere_single(pcl: jnp.ndarray):
    """Normalize one cloud [N, 3]; returns (pcl, center, scale)
    (``utils/denoise.py:27-46``)."""
    p_max = jnp.max(pcl, axis=0, keepdims=True)
    p_min = jnp.min(pcl, axis=0, keepdims=True)
    center = (p_max + p_min) / 2.0
    pcl = pcl - center
    scale = jnp.max(jnp.sqrt(jnp.sum(pcl ** 2, axis=1)))
    return pcl / scale, center, scale


def patch_based_denoise(model, pcl_noisy: jnp.ndarray, ld_step_size: float = 0.2,
                        ld_num_steps: int = 30, patch_size: int = 1000,
                        seed_k: int = 3, denoise_knn: int = 4,
                        step_decay: float = 0.95) -> jnp.ndarray:
    """Denoise one cloud [N, 3] by overlapping-patch Langevin dynamics
    (``utils/denoise.py:56-82``)."""
    N, d = pcl_noisy.shape
    cloud = pcl_noisy[None]                                    # [1, N, 3]
    n_seeds = max(int(seed_k * N / patch_size), 1)
    seeds, _ = farthest_point_sampling(cloud, n_seeds)
    k = min(patch_size, N)
    _, _, patches = knn_points(seeds, cloud, k)                 # [1, S, K, 3]
    patches = patches[0]                                        # [S, K, 3]
    denoised = model.denoise_langevin_dynamics(
        patches, step_size=ld_step_size, denoise_knn=denoise_knn,
        step_decay=step_decay, num_steps=ld_num_steps)
    flat = denoised.reshape(1, -1, d)
    out, _ = farthest_point_sampling(flat, N)
    return out[0]


def denoise_large_pointcloud(model, pcl: np.ndarray, cluster_size: int,
                             seed: int = 0) -> np.ndarray:
    """KMeans-cluster a huge cloud, denoise each cluster
    (``utils/denoise.py:85-105``)."""
    from sklearn.cluster import KMeans

    n_clusters = math.ceil(pcl.shape[0] / cluster_size)
    kmeans = KMeans(n_clusters=n_clusters, random_state=seed, n_init=10).fit(pcl)
    parts: List[np.ndarray] = []
    for i in range(n_clusters):
        part = jnp.asarray(pcl[kmeans.labels_ == i], jnp.float32)
        part, center, scale = normalize_unit_sphere_single(part)
        den = patch_based_denoise(model, part, seed_k=5)
        parts.append(np.asarray(den * scale + center))
    return np.concatenate(parts, axis=0)
