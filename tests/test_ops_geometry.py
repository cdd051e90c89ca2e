"""Unit tests: square_distance / index_points / fps / knn / group vs numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick

from upp_tpu.ops import (fps, group_points, index_points, knn, knn_points,
                         knn_vectors_mean, square_distance)


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_square_distance_matches_numpy():
    a, b = _rand((2, 17, 3), 0), _rand((2, 9, 3), 1)
    got = np.asarray(square_distance(jnp.asarray(a), jnp.asarray(b)))
    want = ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_index_points():
    pts = _rand((2, 10, 4))
    idx = np.array([[[0, 1], [9, 3]], [[5, 5], [2, 0]]], np.int32)
    got = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx)))
    for b in range(2):
        for i in range(2):
            for j in range(2):
                np.testing.assert_array_equal(got[b, i, j], pts[b, idx[b, i, j]])


def _fps_oracle(pts, n):
    """Sequential pointnet2-style FPS in numpy."""
    N = pts.shape[0]
    dists = np.full(N, 1e10)
    idx = np.zeros(n, np.int64)
    cur = 0
    for i in range(n):
        idx[i] = cur
        d = ((pts - pts[cur]) ** 2).sum(-1)
        dists = np.minimum(dists, d)
        cur = int(np.argmax(dists))
    return idx


def test_fps_matches_sequential_oracle():
    pts = _rand((3, 64, 3), 2)
    sampled, idx = fps(jnp.asarray(pts), 16)
    idx = np.asarray(idx)
    for b in range(3):
        np.testing.assert_array_equal(idx[b], _fps_oracle(pts[b], 16))
    np.testing.assert_allclose(np.asarray(sampled)[0], pts[0][idx[0]])


def test_fps_valid_mask_never_selects_invalid():
    pts = _rand((2, 40, 3), 3)
    valid = np.zeros((2, 40), bool)
    valid[:, 10:] = True
    _, idx = fps(jnp.asarray(pts), 8, valid=jnp.asarray(valid))
    assert (np.asarray(idx) >= 10).all()
    # first selected point is the first valid one (matches sorted-split use)
    assert (np.asarray(idx)[:, 0] == 10).all()


def test_fps_indices_unique():
    pts = _rand((2, 128, 3), 4)
    _, idx = fps(jnp.asarray(pts), 64)
    for b in range(2):
        assert len(set(np.asarray(idx)[b].tolist())) == 64


def test_knn_matches_numpy():
    q, p = _rand((2, 5, 3), 5), _rand((2, 30, 3), 6)
    d, idx = knn(jnp.asarray(q), jnp.asarray(p), 4)
    full = ((q[:, :, None, :] - p[:, None, :, :]) ** 2).sum(-1)
    want_idx = np.argsort(full, axis=-1)[..., :4]
    want_d = np.take_along_axis(full, want_idx, axis=-1)
    np.testing.assert_allclose(np.asarray(d), want_d, rtol=1e-4, atol=1e-4)
    # indices may differ on exact ties; distances must agree
    got_d = np.take_along_axis(full, np.asarray(idx), axis=-1)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-4)


def test_knn_points_gathers_neighbors():
    q, p = _rand((1, 4, 3), 7), _rand((1, 20, 3), 8)
    d, idx, nn = knn_points(jnp.asarray(q), jnp.asarray(p), 3)
    np.testing.assert_allclose(np.asarray(nn)[0, 0, 0], p[0, np.asarray(idx)[0, 0, 0]])


def test_knn_vectors_mean():
    noise, clean = _rand((1, 6, 3), 9), _rand((1, 50, 3), 10)
    got = np.asarray(knn_vectors_mean(jnp.asarray(noise), jnp.asarray(clean), k=4))
    full = ((noise[:, :, None, :] - clean[:, None, :, :]) ** 2).sum(-1)
    idx = np.argsort(full, axis=-1)[..., :4]
    want = (clean[0][idx[0]] - noise[0][:, None, :]).mean(1)
    np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-4)


def test_group_points_shapes_and_normalization():
    pts = _rand((2, 256, 3), 11)
    g = group_points(jnp.asarray(pts), num_group=32, group_size=16)
    assert g.neighborhood.shape == (2, 32, 16, 3)
    assert g.center.shape == (2, 32, 3)
    assert g.idx.shape == (2, 32, 16)
    # neighborhood is center-relative: adding back the center recovers the
    # gathered input points
    recon = np.asarray(g.neighborhood) + np.asarray(g.center)[:, :, None, :]
    idx = np.asarray(g.idx)
    for b in range(2):
        np.testing.assert_allclose(recon[b], pts[b][idx[b]], rtol=1e-5, atol=1e-5)
    # each group's nearest neighbour is its own center (distance 0)
    d0 = np.linalg.norm(np.asarray(g.neighborhood)[:, :, 0, :], axis=-1)
    np.testing.assert_allclose(d0, 0.0, atol=1e-5)


def test_fps_pallas_interpret_matches_xla():
    """Fused Pallas kernel (interpret mode on CPU) is index-identical to the
    XLA formulation, masked and unmasked."""
    from upp_tpu.ops.fps_pallas import fps_pallas
    from upp_tpu.ops.fps import _fps_xla

    pts = jnp.asarray(_rand((5, 300, 3), 42))
    i_xla = _fps_xla(pts, 64)[1]
    i_pl = fps_pallas(pts, 64, interpret=True)[1]
    np.testing.assert_array_equal(np.asarray(i_xla), np.asarray(i_pl))

    valid = np.zeros((5, 300), bool)
    valid[:, 77:] = True
    i_xla = _fps_xla(pts, 64, valid=jnp.asarray(valid))[1]
    i_pl = fps_pallas(pts, 64, valid=jnp.asarray(valid), interpret=True)[1]
    np.testing.assert_array_equal(np.asarray(i_xla), np.asarray(i_pl))


@pytest.mark.quick
def test_fps_pallas_emitted_coords_and_grads():
    """The kernel-emitted sample coordinates must equal the idx-gather, and
    gradients w.r.t. the input cloud must match the gather formulation's
    (scatter of the cotangent into the selected rows)."""
    import jax
    import jax.numpy as jnp
    from upp_tpu.ops.fps_pallas import fps_pallas

    pts = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 200, 3)).astype(np.float32))

    def loss_pallas(p):
        s, _ = fps_pallas(p, 64, interpret=True)
        return jnp.sum(jnp.sin(s * 1.7))

    def loss_gather(p):
        _, idx = fps_pallas(p, 64, interpret=True)
        s = jnp.take_along_axis(p, idx[..., None], axis=1)
        return jnp.sum(jnp.sin(s * 1.7))

    s, idx = fps_pallas(pts, 64, interpret=True)
    np.testing.assert_allclose(
        np.asarray(s), np.take_along_axis(np.asarray(pts),
                                          np.asarray(idx)[..., None], axis=1),
        rtol=0, atol=0)
    v1, g1 = jax.value_and_grad(loss_pallas)(pts)
    v2, g2 = jax.value_and_grad(loss_gather)(pts)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.quick
def test_group_points_valid_mask_knn():
    """group_points(valid=...) must honor the mask in the kNN stage too:
    invalid (padded) slots sitting right next to a center must never enter
    the neighborhood while enough valid points exist."""
    from upp_tpu.ops.group import group_points

    rng = np.random.default_rng(5)
    B, N = 3, 120
    pts = np.asarray(rng.standard_normal((B, N, 3)), np.float32)
    valid = np.ones((B, N), bool)
    valid[:, 96:] = False
    pts[:, 96:] = pts[:, :24]        # invalid slots DUPLICATE real points:
    # coincident with valid ones, they'd win ties / enter every neighborhood
    g = group_points(jnp.asarray(pts), 16, 8, valid=jnp.asarray(valid))
    idx = np.asarray(g.idx)
    assert idx.max() < 96, f"invalid slot selected: {idx.max()}"
    assert np.asarray(g.center_idx).max() < 96
    # neighborhoods carry real (center-relative) coordinates
    abs_nb = np.asarray(g.neighborhood) + np.asarray(g.center)[:, :, None, :]
    np.testing.assert_allclose(           # (a-c)+c f32 round-trip noise
        abs_nb, np.take_along_axis(pts, idx.reshape(B, -1, 1), 1)
        .reshape(abs_nb.shape), rtol=1e-5, atol=1e-6)
