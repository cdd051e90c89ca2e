"""Native host library: build, FPS correctness vs numpy oracle, npy reader."""

import os
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from upp_tpu import native


def _fps_oracle(pts, m, start=0):
    n = pts.shape[0]
    dist = np.full(n, 1e10)
    idx = np.empty(m, np.int64)
    cur = start
    for s in range(m):
        idx[s] = cur
        d = ((pts - pts[cur]) ** 2).sum(-1)
        dist = np.minimum(dist, d)
        cur = int(np.argmax(dist))
    return idx


def test_native_builds():
    lib = native.get_lib()
    # the image ships g++, so the native path must be live (not the fallback)
    assert lib is not None


def test_fps_host_matches_oracle():
    pts = np.random.default_rng(0).standard_normal((256, 3)).astype(np.float32)
    got = native.fps_host(pts, 64)
    want = _fps_oracle(pts, 64)
    np.testing.assert_array_equal(got, want)


def test_fps_host_batch():
    pts = np.random.default_rng(1).standard_normal((4, 128, 3)).astype(np.float32)
    got = native.fps_host_batch(pts, 32)
    for b in range(4):
        np.testing.assert_array_equal(got[b], _fps_oracle(pts[b], 32))


def test_read_npy_batch(tmp_path):
    paths = []
    ref = []
    for i in range(6):
        arr = np.random.default_rng(i).standard_normal((100 + i, 3)).astype(np.float32)
        p = str(tmp_path / f"c{i}.npy")
        np.save(p, arr)
        paths.append(p)
        ref.append(arr)
    out = native.read_npy_batch(paths, 100)
    for i in range(6):
        np.testing.assert_allclose(out[i], ref[i][:100], rtol=1e-6)


def test_read_npy_batch_f64(tmp_path):
    arr = np.random.default_rng(9).standard_normal((50, 3))  # float64
    p = str(tmp_path / "d.npy")
    np.save(p, arr)
    out = native.read_npy_batch([p], 50)
    np.testing.assert_allclose(out[0], arr.astype(np.float32), rtol=1e-6)


def test_read_npy_batch_bad_file_raises(tmp_path):
    """A failed read must raise (naming the file), not silently feed an
    all-zero cloud into training (zero clouds NaN the per-cloud
    normalisation downstream)."""
    import pytest

    good = str(tmp_path / "good.npy")
    np.save(good, np.ones((10, 3), np.float32))
    missing = str(tmp_path / "missing.npy")
    with pytest.raises(Exception) as ei:
        native.read_npy_batch([good, missing], 10)
    assert "missing.npy" in str(ei.value)

    corrupt = str(tmp_path / "corrupt.npy")
    with open(corrupt, "wb") as f:
        f.write(b"not an npy file")
    with pytest.raises(Exception):
        native.read_npy_batch([good, corrupt], 10)


def test_shapenet55_native_batch_path(tmp_path):
    """ShapeNet55.get_batch (native parallel .npy reader) returns bit-identical
    batches to the per-item __getitem__+collate path, and BatchLoader
    actually routes through it."""
    import numpy as np
    from upp_tpu.data import BatchLoader
    from upp_tpu.data.shapenet55 import ShapeNet55

    rng = np.random.default_rng(0)
    pc_dir = tmp_path / "pc"
    pc_dir.mkdir()
    lines = []
    for i in range(7):
        name = f"0{i % 3}tax-model{i}.npy"
        np.save(pc_dir / name,
                rng.standard_normal((64, 3)).astype(np.float32))
        lines.append(name)
    (tmp_path / "train.txt").write_text("\n".join(lines))

    import types
    cfg = types.SimpleNamespace(DATA_PATH=str(tmp_path), PC_PATH=str(pc_dir),
                                subset="train", N_POINTS=64)
    ds = ShapeNet55(cfg)

    idx = np.arange(len(ds))
    pts_b, lab_b = ds.get_batch(idx)
    items = [ds[i] for i in idx]
    pts_i = np.stack([it[2][0] for it in items]).astype(np.float32)
    lab_i = np.asarray([it[2][1] for it in items], np.int32)
    np.testing.assert_allclose(pts_b, pts_i, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(lab_b, lab_i)

    loader = BatchLoader(ds, batch_size=4, prefetch=0)
    got = list(loader)
    assert len(got) == 2 and got[0][0].shape == (4, 64, 3)
    np.testing.assert_allclose(got[0][0], pts_i[:4], rtol=1e-6, atol=1e-7)
