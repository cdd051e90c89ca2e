"""Fused Pallas Chamfer-NN kernel vs the chunked-XLA oracle (interpret mode
on CPU; the same kernel compiles via Mosaic on TPU — see BASELINE.md for the
device timings)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.quick

from upp_tpu.ops.chamfer import _nn_idx, chamfer_l1, chamfer_l2, nn_distance
from upp_tpu.ops.chamfer_pallas import _nn_both_impl, nn_both


def _clouds(B, N, M, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((B, M, 3)).astype(np.float32)))


@pytest.mark.parametrize("B,N,M", [(2, 384, 512), (2, 300, 1000),
                                   (1, 128, 2200), (2, 512, 96)])
def test_nn_both_matches_xla_oracle(B, N, M):
    x, y = _clouds(B, N, M, seed=B + N)
    d1, i1, d2, i2 = _nn_both_impl(x, y, None, None, interpret=True)
    assert (np.asarray(i1) == np.asarray(_nn_idx(x, y, None))).all()
    assert (np.asarray(i2) == np.asarray(_nn_idx(y, x, None))).all()
    nn1 = np.take_along_axis(np.asarray(y), np.asarray(i1)[..., None], 1)
    np.testing.assert_allclose(np.asarray(d1),
                               ((np.asarray(x) - nn1) ** 2).sum(-1),
                               rtol=1e-4, atol=1e-5)


def test_nn_both_masked_targets_never_selected():
    B, N, M = 2, 256, 640
    x, y = _clouds(B, N, M, seed=7)
    rng = np.random.default_rng(1)
    vx = jnp.asarray(rng.random((B, N)) > 0.4)
    vy = jnp.asarray(rng.random((B, M)) > 0.4)
    d1, i1, d2, i2 = _nn_both_impl(x, y, vx, vy, interpret=True)
    ri1, ri2 = _nn_idx(x, y, vy), _nn_idx(y, x, vx)
    # query-side values for invalid slots are unspecified (masked by caller);
    # compare only valid queries
    assert (np.asarray(i1) == np.asarray(ri1))[np.asarray(vx)].all()
    assert (np.asarray(i2) == np.asarray(ri2))[np.asarray(vy)].all()
    # invalid targets must never be selected for valid queries
    sel_valid = np.take_along_axis(np.asarray(vy), np.asarray(i1), 1)
    assert sel_valid[np.asarray(vx)].all()


def test_nn_both_tie_break_lowest_index():
    """Duplicated points create exact distance ties; the kernel must return
    the lowest index, like jnp.argmin (and like lax.top_k in knn)."""
    B, N = 1, 128
    rng = np.random.default_rng(3)
    base = rng.standard_normal((B, 64, 3)).astype(np.float32)
    y = jnp.asarray(np.concatenate([base, base, base, base], axis=1))  # 4x dup
    x = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    _, i1, _, _ = _nn_both_impl(x, y, None, None, interpret=True)
    assert (np.asarray(i1) < 64).all()      # always the first duplicate


def test_chamfer_losses_identical_through_dispatch(monkeypatch):
    """chamfer_l1/l2 values and grads agree between the forced-Pallas path
    and the XLA path (the dispatch is trace-time, so clear caches)."""
    x, y = _clouds(2, 384, 640, seed=11)

    def loss(a, b):
        return chamfer_l1(a, b) + chamfer_l2(a, b)

    monkeypatch.setenv("UPP_DISABLE_PALLAS_CHAMFER", "1")
    ref_v, ref_g = jax.value_and_grad(loss)(x, y)
    monkeypatch.delenv("UPP_DISABLE_PALLAS_CHAMFER")
    monkeypatch.setenv("UPP_FORCE_PALLAS_CHAMFER", "1")
    jax.clear_caches()
    try:
        got_v, got_g = jax.value_and_grad(loss)(x, y)
    finally:
        monkeypatch.delenv("UPP_FORCE_PALLAS_CHAMFER")
        jax.clear_caches()
    np.testing.assert_allclose(float(ref_v), float(got_v), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ref_g), np.asarray(got_g),
                               rtol=1e-4, atol=1e-6)
