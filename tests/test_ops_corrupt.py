"""Corruption / augmentation pipeline tests."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from upp_tpu.ops import (gaussian_shell_noise, inverse_distance_interp, jitter,
                         lidar_noise, normalize_unit_sphere, propagate,
                         rotate_y, scale_translate, separate_point_cloud)


pytestmark = pytest.mark.quick


def _cloud(B=2, N=2048, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal((B, N, 3)).astype(np.float32))


def test_gaussian_shell_noise_radius():
    key = jax.random.key(0)
    g = gaussian_shell_noise(key, (4, 512, 3), loc=0.0, scale=0.1, shell_radius=0.9)
    r = np.linalg.norm(np.asarray(g), axis=-1)
    # shell: radii concentrate around shell_radius (displaced N(0, .1) radially)
    assert 0.75 < r.mean() < 1.1
    assert g.shape == (4, 512, 3)


def test_lidar_noise_outward_scaling():
    pts = _cloud(2, 128, 1)
    noise = lidar_noise(jax.random.key(1), pts, number=16, scale=1.5, low=1.2)
    assert noise.shape == (2, 16, 3)
    rn = np.linalg.norm(np.asarray(noise), axis=-1)
    rp = np.linalg.norm(np.asarray(pts), axis=-1)
    assert rn.mean() > rp.mean()  # pushed outward


def test_separate_point_cloud_static_and_disjoint():
    pts = _cloud(2, 2048, 2)
    partial, crop = separate_point_cloud(jax.random.key(2), pts, num_crop=512,
                                         sample_points=256)
    assert partial.shape == (2, 256, 3)
    assert crop.shape == (2, 256, 3)
    # partial and crop come from disjoint halves of the sorted cloud
    p0 = {tuple(np.round(x, 5)) for x in np.asarray(partial)[0]}
    c0 = {tuple(np.round(x, 5)) for x in np.asarray(crop)[0]}
    assert not (p0 & c0)


def test_separate_point_cloud_traced_num_crop():
    """num_crop can be a traced scalar (pretask draws it per step)."""
    pts = _cloud(1, 1024, 3)

    @jax.jit
    def run(key, nc):
        return separate_point_cloud(key, pts, nc, sample_points=128)

    p1, _ = run(jax.random.key(3), jnp.int32(256))
    p2, _ = run(jax.random.key(3), jnp.int32(512))
    assert p1.shape == p2.shape == (1, 128, 3)
    assert not np.allclose(np.asarray(p1), np.asarray(p2))


def test_scale_translate_bounds():
    pts = _cloud(4, 64, 4)
    out = scale_translate(jax.random.key(4), pts)
    assert out.shape == pts.shape
    assert not np.allclose(np.asarray(out), np.asarray(pts))


def test_rotate_y_preserves_y_and_norm():
    pts = _cloud(3, 128, 5)
    out = rotate_y(jax.random.key(5), pts)
    np.testing.assert_allclose(np.asarray(out)[..., 1], np.asarray(pts)[..., 1],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                               np.linalg.norm(np.asarray(pts), axis=-1),
                               rtol=1e-4, atol=1e-4)


def test_jitter_clipped():
    pts = _cloud(1, 256, 6)
    out = jitter(jax.random.key(6), pts, std=0.01, clip=0.03)
    assert np.abs(np.asarray(out - pts)).max() <= 0.03 + 1e-6


def test_normalize_unit_sphere():
    pts = _cloud(2, 128, 7) * 5.0
    out = normalize_unit_sphere(pts)
    r = np.linalg.norm(np.asarray(out), axis=-1).max(axis=1)
    np.testing.assert_allclose(r, 1.0, rtol=1e-5)


def test_inverse_distance_interp_exact_at_sources():
    """Interpolating onto the source points themselves ~ recovers the features
    (nearest neighbour dominates the 1/(d+eps) weights)."""
    xyz2 = _cloud(1, 32, 8)
    feats = _cloud(1, 32, 9)
    out = inverse_distance_interp(xyz2, xyz2, feats, k=4, eps=1e-8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(feats), atol=1e-3)


def test_propagate_residual():
    xyz1, xyz2 = _cloud(1, 64, 10), _cloud(1, 16, 11)
    p1, p2 = _cloud(1, 64, 12), _cloud(1, 16, 13)
    out = propagate(xyz1, xyz2, p1, p2, de_neighbors=8, dist_e=1e-3)
    assert out.shape == (1, 64, 3)
    # residual form: out - p1 = 0.3 * interp
    interp = inverse_distance_interp(xyz1, xyz2, p2, k=8, eps=1e-3)
    np.testing.assert_allclose(np.asarray(out - p1), 0.3 * np.asarray(interp),
                               rtol=1e-5, atol=1e-6)


def test_separate_threshold_equals_sorted_formulation():
    """The threshold-mask crop (no [B,N,3] sort-gather) must select the same
    partial/crop point SETS and the same FPS start as the literal
    sorted-subset formulation of ``misc.seprate_point_cloud``."""
    from upp_tpu.ops.corrupt import _viewpoint_dist
    from upp_tpu.ops.fps import fps

    B, N, num_crop, sp = 2, 1024, 256, 128
    pts = _cloud(B, N, 7)
    key = jax.random.key(11)
    keys = jax.random.split(key, B)
    d = jax.vmap(lambda k, p: _viewpoint_dist(k, p))(keys, pts)
    order = np.argsort(np.asarray(d), axis=1, kind="stable")
    sorted_pts = np.take_along_axis(np.asarray(pts), order[..., None], axis=1)

    # literal formulation: FPS of the sorted far-side subset
    ref_partial, _ = fps(jnp.asarray(sorted_pts[:, num_crop:]), sp)
    # production formulation (what separate_point_cloud now runs)
    partial, _ = separate_point_cloud(key, pts, num_crop, sample_points=sp)
    # same selected point multiset (tie-breaks can only differ on exact
    # distance ties, absent in random data)
    for b in range(B):
        s_ref = {tuple(np.round(x, 6)) for x in np.asarray(ref_partial)[b]}
        s_new = {tuple(np.round(x, 6)) for x in np.asarray(partial)[b]}
        assert s_ref == s_new
    # identical first selection (explicit start matches sorted-subset start)
    np.testing.assert_allclose(np.asarray(partial)[:, 0],
                               np.asarray(ref_partial)[:, 0], rtol=0, atol=0)


def test_separate_handles_distance_ties():
    """Duplicated points create exact distance ties at the crop threshold;
    the threshold-mask split must still assign exactly num_crop points to the
    crop side (stable-sort semantics), not dump every tie into the crop."""
    from upp_tpu.ops.corrupt import _viewpoint_dist

    B, N, num_crop, sp = 1, 512, 128, 64
    base = np.asarray(_cloud(1, 64, 9))            # 64 unique points
    pts = jnp.asarray(np.tile(base, (1, 8, 1)))    # each repeated 8x -> ties
    key = jax.random.key(21)
    partial, crop = separate_point_cloud(key, pts, num_crop, sample_points=sp)
    assert partial.shape == (B, sp, 3) and crop.shape == (B, sp, 3)
    # the crop side must only contain points from the num_crop nearest slots
    d = np.asarray(jax.vmap(lambda k, p: _viewpoint_dist(k, p))(
        jax.random.split(key, B), pts))
    order = np.argsort(d[0], kind="stable")
    crop_set = {tuple(np.round(x, 6)) for x in np.asarray(pts)[0][order[:num_crop]]}
    for x in np.asarray(crop)[0]:
        assert tuple(np.round(x, 6)) in crop_set
    partial_set = {tuple(np.round(x, 6))
                   for x in np.asarray(pts)[0][order[num_crop:]]}
    for x in np.asarray(partial)[0]:
        assert tuple(np.round(x, 6)) in partial_set


def test_pointcloud_scale_translate_only_variants():
    """PointcloudScale / PointcloudTranslate (data_transforms.py:97-123):
    per-sample constant anisotropic factors within the documented bounds."""
    from upp_tpu.ops import pointcloud_scale, pointcloud_translate
    pts = _cloud(4, 256, 3)
    s = np.asarray(pointcloud_scale(jax.random.key(0), pts))
    ratio = s / np.asarray(pts)                      # [B, N, 3]
    per_sample = ratio[:, :1, :]
    np.testing.assert_allclose(ratio, np.broadcast_to(per_sample, ratio.shape),
                               rtol=1e-5)           # constant within a sample
    assert (per_sample >= 2.0 / 3.0 - 1e-6).all()
    assert (per_sample <= 3.0 / 2.0 + 1e-6).all()

    t = np.asarray(pointcloud_translate(jax.random.key(1), pts))
    off = t - np.asarray(pts)
    np.testing.assert_allclose(off, np.broadcast_to(off[:, :1, :], off.shape),
                               atol=1e-6)
    assert (np.abs(off) <= 0.2 + 1e-6).all()


def test_random_input_dropout_replaces_with_first_point():
    """PointcloudRandomInputDropout (data_transforms.py:125-140): dropped
    points collapse onto the cloud's first point; everything else intact."""
    from upp_tpu.ops import random_input_dropout
    pts = _cloud(4, 512, 5)
    out = np.asarray(random_input_dropout(jax.random.key(2), pts,
                                          max_dropout_ratio=0.9))
    src = np.asarray(pts)
    for b in range(4):
        first = src[b, 0]
        moved = ~np.isclose(out[b], src[b]).all(axis=-1)
        assert moved.any(), "with ratio up to 0.9 some point should drop"
        np.testing.assert_allclose(out[b][moved],
                                   np.broadcast_to(first, out[b][moved].shape))


def test_random_horizontal_flip_semantics():
    """RandomHorizontalFlip (data_transforms.py:142-160): each non-upright
    axis is either untouched or reflected as coord_max - coord; the upright
    axis never changes."""
    from upp_tpu.ops import random_horizontal_flip
    pts = _cloud(16, 128, 7)
    out = np.asarray(random_horizontal_flip(jax.random.key(3), pts,
                                            upright_axis="z"))
    src = np.asarray(pts)
    flipped_any = False
    for b in range(16):
        np.testing.assert_allclose(out[b, :, 2], src[b, :, 2])  # upright
        for ax in (0, 1):
            ident = np.allclose(out[b, :, ax], src[b, :, ax])
            refl = np.allclose(out[b, :, ax],
                               src[b, :, ax].max() - src[b, :, ax], atol=1e-6)
            assert ident or refl
            flipped_any = flipped_any or (refl and not ident)
    assert flipped_any   # p_apply=.95, p_axis=.5 over 16 samples x 2 axes


def test_augmentation_registry_dispatch():
    """corrupt_batch resolves every AUGMENTATIONS name to a jittable op."""
    from upp_tpu.train.pipeline import AUGMENTATIONS, corrupt_batch
    pts = _cloud(2, 1024, 11)
    for name in AUGMENTATIONS:
        out = corrupt_batch(jax.random.key(4), pts, npoints=256,
                            n_points_dataset=1024, noisy_train=False,
                            incomplete_cropping=False, add_noise=False,
                            augmentation=name)
        assert out.shape == (2, 256, 3), name
        assert np.isfinite(np.asarray(out)).all(), name
