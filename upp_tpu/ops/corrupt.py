"""On-device corruption + augmentation pipeline.

The reference runs these stages on the *host* with per-sample Python loops and
numpy RNG (``utils/misc.py:28-46,205-256``, ``datasets/data_transforms.py``,
``tools/runner_module.py:127-186``) — the #1 throughput sink. Here every stage
is a pure jittable function over ``jax.random`` keys, so crop → noise →
augment fuses into the train step and the host only streams raw clouds.

Variable-size crops become *static-shape masked* ops: points are sorted by
distance to a random viewpoint, the crop/partial split is a positional mask,
and masked FPS (see ``ops.fps``) resamples each side to a fixed size.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .fps import fps


def gaussian_shell_noise(key: jax.Array, shape: Tuple[int, ...], loc: float = 0.0,
                         scale: float = 0.2, shell_radius: float = 0.9) -> jnp.ndarray:
    """Shell noise imitating depth-camera outliers (``utils/misc.py:28-36``):
    N(loc, scale) samples displaced radially outward to ``shell_radius``."""
    g = loc + scale * jax.random.normal(key, shape, jnp.float32)
    direction = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    return g + direction * shell_radius


def lidar_noise(key: jax.Array, points: jnp.ndarray, number: int = 64,
                scale: float = 1.3, low: float = 1.02) -> jnp.ndarray:
    """Lidar-style outliers: random existing points pushed radially outward by
    U(low, scale) (``utils/misc.py:38-46``). Like the reference, the chosen
    indices and factors are shared across the batch (one draw per step)."""
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (number,), 0, points.shape[1])
    factor = jax.random.uniform(k2, (number,), jnp.float32, low, scale)
    return points[:, idx, :] * factor[None, :, None]


def _kth_smallest_nonneg(d: jnp.ndarray, k) -> jnp.ndarray:
    """Exact k-th smallest (1-based, per row) of NON-NEGATIVE f32 ``d``
    [B, N] by binary search on the monotone uint32 bit pattern — 32
    compare+count passes instead of a full per-row sort (the crop threshold
    is the only thing `separate_point_cloud` needs from the sort)."""
    bits = jax.lax.bitcast_convert_type(d, jnp.uint32)
    k = jnp.asarray(k, jnp.int32)

    def body(_, lo_hi):
        lo, hi = lo_hi          # invariant: count(<= lo-1) < k <= count(<= hi)
        mid = lo + (hi - lo) // 2
        cnt = jnp.sum((bits <= mid[:, None]).astype(jnp.int32), axis=1)
        go_right = cnt < k
        return (jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid))

    B = d.shape[0]
    lo = jnp.zeros((B,), jnp.uint32)
    hi = jnp.full((B,), jnp.uint32(0x7F800000))   # +inf
    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    return jax.lax.bitcast_convert_type(hi, jnp.float32)


def _viewpoint_dist(key: jax.Array, points: jnp.ndarray,
                    fixed_viewpoint: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Squared distance of one cloud's points to a (random) unit viewpoint
    (``misc.seprate_point_cloud``'s F.normalize(randn) center). Returns [N]."""
    if fixed_viewpoint is None:
        v = jax.random.normal(key, (3,), jnp.float32)
        v = v / jnp.linalg.norm(v)
    else:
        v = fixed_viewpoint
    return jnp.sum((points - v[None, :]) ** 2, axis=-1)


def _viewpoint_split(key: jax.Array, points: jnp.ndarray,
                     fixed_viewpoint: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Sort one cloud's points by distance to a (random) unit viewpoint.
    Returns the ascending-order permutation [N]."""
    return jnp.argsort(_viewpoint_dist(key, points, fixed_viewpoint))


def separate_point_cloud(key: jax.Array, xyz: jnp.ndarray, num_crop,
                         sample_points: int = 1024,
                         fixed_viewpoint: Optional[jnp.ndarray] = None,
                         resample: bool = True
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if resample:
        return _separate_resampled(key, xyz, num_crop, sample_points,
                                   fixed_viewpoint)
    # raw split: num_crop must be a Python int (static output shapes)
    return _separate_raw(key, xyz, int(num_crop), fixed_viewpoint)


@partial(jax.jit, static_argnames=("num_crop",))
def _separate_raw(key, xyz, num_crop: int, fixed_viewpoint=None):
    B, N, _ = xyz.shape
    keys = jax.random.split(key, B)
    order = jax.vmap(lambda k, p: _viewpoint_split(k, p, fixed_viewpoint))(keys, xyz)
    sorted_pts = jnp.take_along_axis(xyz, order[..., None], axis=1)
    return sorted_pts[:, num_crop:], sorted_pts[:, :num_crop]


@partial(jax.jit, static_argnames=("sample_points",))
def _separate_resampled(key: jax.Array, xyz: jnp.ndarray, num_crop,
                        sample_points: int = 1024,
                        fixed_viewpoint: Optional[jnp.ndarray] = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Viewpoint crop → (partial, crop), both FPS-resampled to ``sample_points``.

    Static-shape reimplementation of ``misc.seprate_point_cloud``
    (``utils/misc.py:205-256``): per-sample random unit viewpoint, points
    sorted by distance to it, nearest ``num_crop`` removed as the "crop"
    (missing region), the rest kept as the "partial" cloud. ``num_crop`` may be
    a traced scalar (the pretask runner draws it per step), handled by masked
    FPS instead of dynamic shapes. Callers must ensure
    num_crop >= sample_points and N - num_crop >= sample_points.

    With ``resample=False`` (requires static ``num_crop``) the raw sorted
    split is returned without FPS — the reference's
    ``input_data.shape[1] <= sample_points`` branch (``misc.py:244-251``,
    hit by the segmentation runner where partial < npoints).

    Returns (partial, crop): [B, sample_points, 3] each when resampling,
    else ([B, N-num_crop, 3], [B, num_crop, 3]).
    """
    B, N, _ = xyz.shape
    keys = jax.random.split(key, B)
    d = jax.vmap(lambda k, p: _viewpoint_dist(k, p, fixed_viewpoint))(keys, xyz)
    # Threshold formulation: the nearest num_crop points are exactly those
    # with d <= (num_crop-th smallest d). This avoids materialising the
    # [B, N, 3] distance-sorted cloud (a ~7 ms TPU gather at 120×8192) —
    # only the VALUES are sorted. FPS then runs on the original cloud with a
    # validity mask + an explicit start (= the same point the reference's
    # FPS-of-the-sorted-subset would start from). Identical point sets and
    # start; only argmax tie-breaks inside FPS can differ (measure-zero).
    nc = jnp.asarray(num_crop, jnp.int32)          # python int or traced scalar
    thresh = _kth_smallest_nonneg(d, nc)[:, None]                  # [B, 1]
    # exact stable-argsort membership even with distance TIES at the
    # threshold (duplicated points): points strictly below go to crop; of
    # the ties at d == thresh, the first (num_crop - #below) in index order
    # go to crop — exactly where a stable sort places them
    below = d < thresh
    at = d == thresh
    n_below = jnp.sum(below, axis=1, keepdims=True)            # [B, 1]
    tie_rank = jnp.cumsum(at.astype(jnp.int32), axis=1)        # 1-based
    crop_valid = below | (at & (tie_rank <= nc - n_below))
    partial_valid = ~crop_valid            # farthest N - num_crop points
    big = jnp.float32(jnp.inf)
    start_partial = jnp.argmin(jnp.where(partial_valid, d, big), axis=1)
    start_crop = jnp.argmin(d, axis=1)
    partial, _ = fps(xyz, sample_points, valid=partial_valid,
                     start_idx=start_partial)
    crop, _ = fps(xyz, sample_points, valid=crop_valid, start_idx=start_crop)
    return partial, crop


def scale_translate(key: jax.Array, pc: jnp.ndarray,
                    scale_low: float = 2.0 / 3.0, scale_high: float = 3.0 / 2.0,
                    translate_range: float = 0.2) -> jnp.ndarray:
    """Per-sample anisotropic scale + translate
    (``datasets/data_transforms.py:54-68``)."""
    B = pc.shape[0]
    k1, k2 = jax.random.split(key)
    s = jax.random.uniform(k1, (B, 1, 3), jnp.float32, scale_low, scale_high)
    t = jax.random.uniform(k2, (B, 1, 3), jnp.float32, -translate_range, translate_range)
    return pc * s + t


def rotate_y(key: jax.Array, pc: jnp.ndarray) -> jnp.ndarray:
    """Per-sample rotation about the y axis by U(-pi, pi)
    (``datasets/data_transforms.py:7-51`` with angle=[0, 1, 0]; the x/z bounds
    are zero so only the y rotation is non-identity)."""
    B = pc.shape[0]
    theta = jax.random.uniform(key, (B,), jnp.float32, -jnp.pi, jnp.pi)
    c, s = jnp.cos(theta), jnp.sin(theta)
    zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
    # rotation about y: R = [[c,0,s],[0,1,0],[-s,0,c]]; applied as pc @ R.T
    rt = jnp.stack([jnp.stack([c, zeros, -s], -1),
                    jnp.stack([zeros, ones, zeros], -1),
                    jnp.stack([s, zeros, c], -1)], axis=-2)        # [B, 3, 3] = R.T
    return jnp.einsum("bnc,bcd->bnd", pc, rt, precision=jax.lax.Precision.HIGHEST)


def jitter(key: jax.Array, pc: jnp.ndarray, std: float = 0.01,
           clip: float = 0.03) -> jnp.ndarray:
    """Clipped gaussian jitter (``datasets/data_transforms.py:71-82``)."""
    noise = jnp.clip(std * jax.random.normal(key, pc.shape, jnp.float32), -clip, clip)
    return pc + noise


def pointcloud_scale(key: jax.Array, pc: jnp.ndarray,
                     scale_low: float = 2.0 / 3.0,
                     scale_high: float = 3.0 / 2.0) -> jnp.ndarray:
    """Per-sample anisotropic scale only
    (``datasets/data_transforms.py:97-109`` PointcloudScale)."""
    B = pc.shape[0]
    s = jax.random.uniform(key, (B, 1, 3), jnp.float32, scale_low, scale_high)
    return pc * s


def pointcloud_translate(key: jax.Array, pc: jnp.ndarray,
                         translate_range: float = 0.2) -> jnp.ndarray:
    """Per-sample translate only
    (``datasets/data_transforms.py:111-123`` PointcloudTranslate)."""
    B = pc.shape[0]
    t = jax.random.uniform(key, (B, 1, 3), jnp.float32,
                           -translate_range, translate_range)
    return pc + t


def random_input_dropout(key: jax.Array, pc: jnp.ndarray,
                         max_dropout_ratio: float = 0.5) -> jnp.ndarray:
    """Random input dropout (``datasets/data_transforms.py:125-140``
    PointcloudRandomInputDropout): per sample, ratio ~ U(0, max); each point
    is dropped with prob ratio by being overwritten with the cloud's FIRST
    point (static shapes preserved — dropped points collapse onto a
    duplicate, exactly the reference's replacement rule)."""
    B, N, _ = pc.shape
    k1, k2 = jax.random.split(key)
    ratio = jax.random.uniform(k1, (B, 1), jnp.float32) * max_dropout_ratio
    drop = jax.random.uniform(k2, (B, N), jnp.float32) <= ratio
    return jnp.where(drop[..., None], pc[:, :1, :], pc)


def random_horizontal_flip(key: jax.Array, pc: jnp.ndarray,
                           upright_axis: str = "z",
                           p_apply: float = 0.95,
                           p_axis: float = 0.5) -> jnp.ndarray:
    """Random horizontal flip (``datasets/data_transforms.py:142-160``
    RandomHorizontalFlip): with prob ``p_apply`` per sample, each
    non-upright axis independently flips with prob ``p_axis`` as
    ``coord_max - coord`` (the reference's max-reflection, not a sign flip).
    """
    up = {"x": 0, "y": 1, "z": 2}[upright_axis.lower()]
    B = pc.shape[0]
    k1, k2 = jax.random.split(key)
    apply = jax.random.uniform(k1, (B, 1), jnp.float32) < p_apply
    axis_flip = jax.random.uniform(k2, (B, 3), jnp.float32) < p_axis
    do = apply & axis_flip
    do = do.at[:, up].set(False)                    # never flip the upright axis
    cmax = jnp.max(pc, axis=1, keepdims=True)       # [B, 1, 3]
    return jnp.where(do[:, None, :], cmax - pc, pc)


def normalize_unit_sphere(pc: jnp.ndarray, recenter: bool = False) -> jnp.ndarray:
    """Scale each cloud into the unit sphere
    (``datasets/data_transforms.py:163-182``; the shipped default keeps the
    center at the origin and only rescales)."""
    if recenter:
        p_max = jnp.max(pc, axis=1, keepdims=True)
        p_min = jnp.min(pc, axis=1, keepdims=True)
        pc = pc - (p_max + p_min) / 2.0
    scale = jnp.max(jnp.linalg.norm(pc, axis=-1, keepdims=True), axis=1, keepdims=True)
    return pc / scale
