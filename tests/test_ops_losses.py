"""Chamfer + EMD kernels: numpy oracles, finite-difference grads, and the
golden-value EMD test ported from the reference
(``extensions/emd/test_emd_loss.py``)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from upp_tpu.ops import (approx_match, chamfer_l1, chamfer_l2,
                         chamfer_l2_split, earth_mover_distance, match_cost,
                         nn_distance)


pytestmark = pytest.mark.quick


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def _chamfer_oracle(a, b):
    d = ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)
    return d.min(2), d.min(1)


def test_nn_distance_matches_numpy():
    a, b = _rand((2, 33, 3), 0), _rand((2, 47, 3), 1)
    d1, i1, d2, i2 = nn_distance(jnp.asarray(a), jnp.asarray(b))
    w1, w2 = _chamfer_oracle(a, b)
    np.testing.assert_allclose(np.asarray(d1), w1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), w2, rtol=1e-4, atol=1e-5)


def test_chamfer_reductions():
    a, b = _rand((3, 20, 3), 2), _rand((3, 25, 3), 3)
    w1, w2 = _chamfer_oracle(a, b)
    l2 = float(chamfer_l2(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(l2, w1.mean() + w2.mean(), rtol=1e-4)
    l1 = float(chamfer_l1(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(l1, (np.sqrt(w1).mean() + np.sqrt(w2).mean()) / 2, rtol=1e-4)
    s1, s2 = chamfer_l2_split(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(float(s1), w1.mean(), rtol=1e-4)
    np.testing.assert_allclose(float(s2), w2.mean(), rtol=1e-4)


def test_chamfer_masked_ignores_padding():
    a = _rand((1, 16, 3), 4)
    pad = np.concatenate([a, np.full((1, 8, 3), 7.0, np.float32)], axis=1)
    valid = np.arange(24)[None, :] < 16
    b = _rand((1, 20, 3), 5)
    got = float(chamfer_l2(jnp.asarray(pad), jnp.asarray(b), valid1=jnp.asarray(valid)))
    want = float(chamfer_l2(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_chamfer_grad_finite_difference():
    """gradcheck analogue of extensions/chamfer_dist/test.py:23-28."""
    a, b = _rand((1, 8, 3), 6), _rand((1, 11, 3), 7)
    check_grads(lambda x, y: chamfer_l2(x, y), (jnp.asarray(a), jnp.asarray(b)),
                order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_emd_golden_two_point_matching():
    """Golden test from extensions/emd/test_emd_loss.py: a 2-point cloud pair
    whose optimal matching (and therefore approx EMD) is computable by hand."""
    p1 = np.array([[[1.7, -0.1, 0.1], [0.1, 1.2, 0.3]]], np.float32).repeat(3, 0)
    p2 = np.array([[[0.3, 1.8, 0.2], [1.2, -0.2, 0.3]]], np.float32).repeat(3, 0)
    # optimal: p1[0] <-> p2[1], p1[1] <-> p2[0]
    d_opt = (((p1[0, 0] - p2[0, 1]) ** 2).sum() + ((p1[0, 1] - p2[0, 0]) ** 2).sum())
    cost = earth_mover_distance(jnp.asarray(p1), jnp.asarray(p2), reduce_mean=False)
    # earth_mover_distance divides by n (=2)
    np.testing.assert_allclose(np.asarray(cost), np.full(3, d_opt / 2), rtol=1e-3)


def test_emd_golden_gradients():
    p1 = jnp.asarray(np.array([[[1.7, -0.1, 0.1], [0.1, 1.2, 0.3]]], np.float32).repeat(3, 0))
    p2 = jnp.asarray(np.array([[[0.3, 1.8, 0.2], [1.2, -0.2, 0.3]]], np.float32).repeat(3, 0))

    def loss(a, b):
        d = earth_mover_distance(a, b, reduce_mean=False)
        return d[0] / 2 + d[1] * 2 + d[2] / 3

    g1, g2 = jax.grad(loss, argnums=(0, 1))(p1, p2)
    # analytic grads of the matched-pair squared distances (match ~ permutation)
    w = np.array([0.5, 2.0, 1.0 / 3.0], np.float32) / 2.0  # /n
    p1n, p2n = np.asarray(p1), np.asarray(p2)
    want1 = np.stack([2 * (p1n[i] - p2n[i][::-1]) * w[i] for i in range(3)])
    np.testing.assert_allclose(np.asarray(g1), want1, rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g2), -want1[:, ::-1], rtol=1e-2, atol=1e-3)


def test_approx_match_is_doubly_stochastic_when_square():
    a, b = _rand((2, 32, 3), 8), _rand((2, 32, 3), 9)
    m = np.asarray(approx_match(jnp.asarray(a), jnp.asarray(b)))  # [B, m, n]
    np.testing.assert_allclose(m.sum(1), 1.0, atol=2e-2)
    np.testing.assert_allclose(m.sum(2), 1.0, atol=2e-2)


def test_match_cost_custom_vjp_matches_formula():
    a, b = _rand((1, 6, 3), 10), _rand((1, 6, 3), 11)
    m = approx_match(jnp.asarray(a), jnp.asarray(b))

    def cost(x, y):
        return match_cost(x, y, m)[0]

    g1, g2 = jax.grad(cost, argnums=(0, 1))(jnp.asarray(a), jnp.asarray(b))
    mn = np.asarray(m)[0].T  # [n, m]
    want1 = 2 * (a[0] * mn.sum(1, keepdims=True) - mn @ b[0])
    want2 = 2 * (b[0] * mn.sum(0)[:, None] - mn.T @ a[0])
    np.testing.assert_allclose(np.asarray(g1)[0], want1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2)[0], want2, rtol=1e-4, atol=1e-5)


def test_emd_fused_matches_explicit_match_path():
    """The fused cost scan (no materialized match) must agree with the
    explicit approx_match + match_cost path — values AND gradients — on
    uneven cloud sizes in both directions."""
    for shape1, shape2, seed in [((2, 32, 3), (2, 32, 3), 30),
                                 ((2, 48, 3), (2, 24, 3), 31),
                                 ((2, 16, 3), (2, 64, 3), 32)]:
        a = jnp.asarray(_rand(shape1, seed))
        b = jnp.asarray(_rand(shape2, seed + 100))

        def explicit(x, y):
            m = jax.lax.stop_gradient(approx_match(x, y))
            return match_cost(x, y, m) / x.shape[1]

        def fused(x, y):
            return earth_mover_distance(x, y, reduce_mean=False)

        np.testing.assert_allclose(np.asarray(fused(a, b)),
                                   np.asarray(explicit(a, b)),
                                   rtol=1e-5, atol=1e-6)
        ge = jax.grad(lambda x, y: explicit(x, y).sum(), argnums=(0, 1))(a, b)
        gf = jax.grad(lambda x, y: fused(x, y).sum(), argnums=(0, 1))(a, b)
        for e, f in zip(ge, gf):
            np.testing.assert_allclose(np.asarray(f), np.asarray(e),
                                       rtol=1e-4, atol=1e-6)


def test_emd_fused_matches_explicit_match_path_bf16():
    """Both paths promote to f32 internally (ADVICE r4: match_cost used to
    build d2 in the input dtype), so bf16 inputs must also agree."""
    a = jnp.asarray(_rand((2, 32, 3), 40)).astype(jnp.bfloat16)
    b = jnp.asarray(_rand((2, 32, 3), 41)).astype(jnp.bfloat16)

    def explicit(x, y):
        m = jax.lax.stop_gradient(approx_match(x, y))
        return match_cost(x, y, m) / x.shape[1]

    fused = earth_mover_distance(a, b, reduce_mean=False)
    np.testing.assert_allclose(np.asarray(fused, np.float32),
                               np.asarray(explicit(a, b), np.float32),
                               rtol=1e-5, atol=1e-6)


def test_emd_close_to_optimal_assignment():
    """approx_match cost is near the true optimal transport cost computed by
    scipy's Hungarian algorithm on equal-size clouds."""
    from scipy.optimize import linear_sum_assignment
    rng = np.random.default_rng(11)
    a = rng.standard_normal((2, 24, 3)).astype(np.float32)
    b = rng.standard_normal((2, 24, 3)).astype(np.float32)
    approx = np.asarray(earth_mover_distance(jnp.asarray(a), jnp.asarray(b),
                                             reduce_mean=False))
    for i in range(2):
        cost_mat = ((a[i][:, None, :] - b[i][None, :, :]) ** 2).sum(-1)
        r, c = linear_sum_assignment(cost_mat)
        optimal = cost_mat[r, c].sum() / 24.0
        assert approx[i] >= optimal - 1e-4   # can't beat optimal
        # the Fan/Mo auction heuristic (same algorithm as the CUDA kernel) is
        # loose on unstructured gaussian clouds; observed ~1.6x optimal there
        assert approx[i] <= optimal * 2.0


def test_chamfer_both_masks():
    a = _rand((1, 10, 3), 20)
    b = _rand((1, 12, 3), 21)
    pa = np.concatenate([a, np.full((1, 6, 3), 9.0, np.float32)], 1)
    pb = np.concatenate([b, np.full((1, 4, 3), -9.0, np.float32)], 1)
    va = np.arange(16)[None] < 10
    vb = np.arange(16)[None] < 12
    got = float(chamfer_l2(jnp.asarray(pa), jnp.asarray(pb),
                           valid1=jnp.asarray(va), valid2=jnp.asarray(vb)))
    want = float(chamfer_l2(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_chamfer_per_sample_matches_scalar_and_bs1_sweep():
    """Per-sample CD vectors (batched pretask validate) reproduce both the
    batch-mean scalar and the bs=1 sweep average exactly — so lifting val bs
    from 1 changes wall-clock only (VERDICT r3 item 5)."""
    from upp_tpu.ops.chamfer import chamfer_l1_per_sample, chamfer_l2_per_sample
    from upp_tpu.train.metrics import AverageMeter

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((7, 33, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((7, 21, 3)).astype(np.float32))

    l1v = np.asarray(chamfer_l1_per_sample(x, y))
    l2v = np.asarray(chamfer_l2_per_sample(x, y))
    assert l1v.shape == (7,) and l2v.shape == (7,)
    np.testing.assert_allclose(l1v.mean(), float(chamfer_l1(x, y)), rtol=1e-6)
    np.testing.assert_allclose(l2v.mean(), float(chamfer_l2(x, y)), rtol=1e-6)
    # per-sample row i == the bs=1 call on sample i
    for i in (0, 4, 6):
        np.testing.assert_allclose(
            l1v[i], float(chamfer_l1(x[i:i + 1], y[i:i + 1])), rtol=1e-5)

    # meter accumulation over uneven batches [5, 2] == bs=1 sweep over 7
    m_batched = AverageMeter(["l1"])
    m_batched.update_vectors([l1v[:5]])
    m_batched.update_vectors([l1v[5:]])
    m_bs1 = AverageMeter(["l1"])
    for i in range(7):
        m_bs1.update([float(l1v[i])])
    np.testing.assert_allclose(m_batched.avg(0), m_bs1.avg(0), rtol=1e-7)
    assert m_batched.count(0) == 7
