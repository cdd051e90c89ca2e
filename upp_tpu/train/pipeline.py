"""On-device per-batch corruption pipeline shared by the runners.

This is the jitted equivalent of the host-side stages in
``tools/runner_module.py:112-191`` / ``tools/runner_finetune.py`` /
``tools/runner_unify_seg.py:205-222``: FPS-or-crop subsampling, shell/lidar
noise injection, and augmentation — fused into the train step so raw clouds
stream straight from the loader.

Noise constants follow ``tools/runner_finetune.py:20-21``:
Gaussian_noise_number = 24, lidar_noise_number = 48.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.corrupt import (gaussian_shell_noise, jitter, lidar_noise,
                           normalize_unit_sphere, pointcloud_scale,
                           pointcloud_translate, random_horizontal_flip,
                           random_input_dropout, rotate_y, scale_translate,
                           separate_point_cloud)
from ..ops.fps import fps

# augmentation-name → jittable op, the reference's transform-registry surface
# (datasets/data_transforms.py); 'rotate'/'scale-translate' are what shipped
# configs use, the rest are selectable by the same config key
AUGMENTATIONS = {
    "rotate": rotate_y,
    "scale-translate": scale_translate,
    "scale": pointcloud_scale,
    "translate": pointcloud_translate,
    "jitter": jitter,
    "dropout": random_input_dropout,
    "hflip": random_horizontal_flip,
}

def resolve_augmentation(name):
    """Config key -> jittable transform; unknown names fail at step-build
    time instead of silently training without augmentation."""
    if not name or name == "none":
        return None
    if name not in AUGMENTATIONS:
        raise ValueError(f"unknown data_augmentation {name!r}; "
                         f"known: {sorted(AUGMENTATIONS)}")
    return AUGMENTATIONS[name]


GAUSSIAN_NOISE_NUMBER = 24
LIDAR_NOISE_NUMBER = 48


def point_all_for(npoints: int, available: int) -> int:
    """Oversampling size before the random FPS-column pick
    (``runner_module.py:112-124``)."""
    table = {1024: 1200, 2048: 2400, 4096: 4800, 8192: 8192}
    # non-shipped sizes oversample by the same ~1.17x factor
    point_all = table.get(npoints, max(int(npoints * 1.17), npoints))
    return min(point_all, available)


def subsample_fps_random(rng: jax.Array, pts: jnp.ndarray, npoints: int) -> jnp.ndarray:
    """FPS to point_all then keep a random npoints-subset of the FPS columns
    (``runner_module.py:151-153``)."""
    point_all = point_all_for(npoints, pts.shape[1])
    sampled, _ = fps(pts, point_all)
    choice = jax.random.permutation(rng, point_all)[:npoints]
    return sampled[:, choice, :]


def corrupt_batch(rng: jax.Array, pts: jnp.ndarray, *, npoints: int,
                  n_points_dataset: int, noisy_train: bool,
                  incomplete_cropping: bool, crop_ratio: float = 0.25,
                  add_noise: bool = True,
                  noise_types: Sequence[str] = ("gaussian_noise", "lidar_noise"),
                  gaussian_number: int = GAUSSIAN_NOISE_NUMBER,
                  lidar_number: int = LIDAR_NOISE_NUMBER,
                  augmentation: Optional[str] = "scale-translate",
                  normalize: bool = False) -> jnp.ndarray:
    """Full train-time corruption: crop/subsample → normalize? → noise →
    augment. Output has npoints (+ noise points) per cloud, static shape."""
    k_crop, k_lidar, k_gauss, k_aug = jax.random.split(rng, 4)
    B = pts.shape[0]

    if noisy_train and incomplete_cropping:
        points, _ = separate_point_cloud(
            k_crop, pts, int(n_points_dataset * crop_ratio), sample_points=npoints)
    else:
        points = subsample_fps_random(k_crop, pts, npoints)

    if normalize:
        points = normalize_unit_sphere(points)

    if noisy_train and add_noise:
        if "lidar_noise" in noise_types:
            noise = lidar_noise(k_lidar, points, lidar_number, low=1.2, scale=1.5)
            points = jnp.concatenate([points, noise], axis=1)
        if "gaussian_noise" in noise_types:
            noise = gaussian_shell_noise(k_gauss, (B, gaussian_number, 3),
                                         loc=0.0, scale=0.1, shell_radius=0.9)
            points = jnp.concatenate([points, noise], axis=1)

    aug_fn = AUGMENTATIONS.get(augmentation) if augmentation else None
    if aug_fn is not None:
        points = aug_fn(k_aug, points)
    return points
