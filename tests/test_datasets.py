"""Dataset-reader round-trips over tiny on-disk fixtures — one per format the
reference ships (SURVEY.md §2.4): ModelNet txt→FPS-cache, ShapeNet55 npy
lists (+ the native batched reader), ScanObjectNN h5 (+hardest), ShapeNetPart
txt/JSON splits, few-shot pickle generator→loader, Projected_ShapeNet
partial/complete pairs, RealSensor pcd trees, and the ASCII ply/pcd IO path.

Reference formats: datasets/ModelNetDataset.py:52-149,
ShapeNet55Dataset.py:9-66, ScanObjectNNDataset.py:11-87,
PartNormalDataset.py:21-123, ModelNetDatasetFewShot.py:28-71,
ProjectedShapeNetDataset.py:15-82, RealSensorDataset.py:31-78, io.py.
"""

import json
import os
import pickle

import numpy as np
import pytest

from upp_tpu.utils.config import ConfigDict

pytestmark = pytest.mark.quick

rng = np.random.default_rng(0)


def _cloud(n=64, c=3):
    return rng.standard_normal((n, c)).astype(np.float32)


# ---------------------------------------------------------------- ModelNet
@pytest.fixture()
def modelnet_root(tmp_path):
    root = tmp_path / "modelnet"
    root.mkdir()
    names = ["airplane", "chair"]
    (root / "modelnet40_shape_names.txt").write_text("\n".join(names) + "\n")
    ids = {"train": ["airplane_0001", "chair_0001", "chair_0002"],
           "test": ["airplane_0002", "chair_0003"]}
    for subset, id_list in ids.items():
        (root / f"modelnet40_{subset}.txt").write_text("\n".join(id_list) + "\n")
        for sid in id_list:
            name = "_".join(sid.split("_")[:-1])
            d = root / name
            d.mkdir(exist_ok=True)
            pts = np.concatenate([_cloud(40, 3), _cloud(40, 3)], axis=1)[:, :6]
            np.savetxt(d / f"{sid}.txt", pts, delimiter=",")
    return str(root)


def test_modelnet_cache_build_and_reload(modelnet_root):
    from upp_tpu.data.modelnet import ModelNet
    cfg = ConfigDict.from_nested({"DATA_PATH": modelnet_root, "N_POINTS": 16,
                                  "NUM_CATEGORY": 40, "subset": "train"})
    ds = ModelNet(cfg)
    assert len(ds) == 3
    tax, _, (pts, label) = ds[1]
    assert tax == "ModelNet" and pts.shape == (16, 3) and label == 1
    # unit-sphere normalised
    assert np.max(np.linalg.norm(pts, axis=1)) <= 1.0 + 1e-5
    cache = os.path.join(modelnet_root, "modelnet40_train_16pts_fps.dat")
    assert os.path.exists(cache)
    # second construction loads the pickled cache byte-for-byte
    with open(cache, "rb") as f:
        cached_pts, cached_labels = pickle.load(f)
    ds2 = ModelNet(cfg)
    np.testing.assert_array_equal(np.asarray(cached_pts[1]),
                                  np.asarray(ds2.list_of_points[1]))
    assert [int(np.ravel(l)[0]) for l in cached_labels] == [0, 1, 1]
    # eval subset: deterministic point order (no train-time shuffle)
    cfg_t = ConfigDict.from_nested({"DATA_PATH": modelnet_root, "N_POINTS": 16,
                                    "NUM_CATEGORY": 40, "subset": "test"})
    dt = ModelNet(cfg_t)
    a = dt[0][2][0]
    b = dt[0][2][0]
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------- few-shot
def test_few_shot_generator_and_loader(modelnet_root, tmp_path):
    from upp_tpu.data.fewshot import ModelNetFewShot
    from upp_tpu.data.generate_few_shot import generate
    out = str(tmp_path / "fewshot")
    generate(modelnet_root, out, way=2, shot=1, folds=1, npoints=16)
    cfg = ConfigDict.from_nested({"DATA_PATH": out, "N_POINTS": 16,
                                  "subset": "train", "way": 2, "shot": 1,
                                  "fold": 0})
    ds = ModelNetFewShot(cfg)
    assert len(ds) == 2                       # 2 ways × 1 shot
    _, _, (pts, label) = ds[0]
    assert pts.shape == (16, 3) and label in (0, 1)
    cfg_t = ConfigDict.from_nested({"DATA_PATH": out, "N_POINTS": 16,
                                    "subset": "test", "way": 2, "shot": 1,
                                    "fold": 0})
    assert len(ModelNetFewShot(cfg_t)) >= 1   # ≤20 test items per way


# -------------------------------------------------------------- ShapeNet55
@pytest.fixture()
def shapenet_root(tmp_path):
    root = tmp_path / "sn"
    pc = tmp_path / "sn_pc"
    root.mkdir(); pc.mkdir()
    lines = []
    for tax, model in (("02691156", "m1"), ("02691156", "m2"),
                       ("03001627", "m3")):
        fname = f"{tax}-{model}.npy"
        np.save(pc / fname, _cloud(32))
        lines.append(fname)
    lines.append("02691156-missing.npy")      # counted as missing, skipped
    (root / "train.txt").write_text("\n".join(lines) + "\n")
    return str(root), str(pc)


def test_shapenet55_items_and_labels(shapenet_root):
    from upp_tpu.data.shapenet55 import ShapeNet55
    root, pc = shapenet_root
    cfg = ConfigDict.from_nested({"DATA_PATH": root, "PC_PATH": pc,
                                  "N_POINTS": 32, "subset": "train"})
    ds = ShapeNet55(cfg)
    assert len(ds) == 3                       # missing entry skipped
    tax, model, (pts, label) = ds[0]
    assert (tax, model) == ("02691156", "m1")
    assert pts.shape == (32, 3) and label == 0
    assert ds[2][2][1] == 1                   # second taxonomy → label 1
    assert np.max(np.linalg.norm(pts, axis=1)) <= 1.0 + 1e-5


def test_shapenet55_native_batch_read(shapenet_root):
    from upp_tpu.native import get_lib
    if get_lib() is None:
        pytest.skip("native library unavailable")
    from upp_tpu.data.shapenet55 import ShapeNet55
    root, pc = shapenet_root
    cfg = ConfigDict.from_nested({"DATA_PATH": root, "PC_PATH": pc,
                                  "N_POINTS": 32, "subset": "train"})
    ds = ShapeNet55(cfg)
    pts, labels = ds.get_batch([0, 1, 2])
    assert pts.shape == (3, 32, 3) and labels.tolist() == [0, 0, 1]
    # identical to the per-item path (same normalisation math)
    one = ds[1][2][0]
    np.testing.assert_allclose(pts[1], one, rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------- ScanObjectNN
def test_scanobjectnn_h5(tmp_path):
    h5py = pytest.importorskip("h5py")
    from upp_tpu.data.scanobjectnn import ScanObjectNN, ScanObjectNNHardest
    data = _cloud(5 * 24).reshape(5, 24, 3)
    labels = np.array([0, 1, 2, 1, 0])
    for fname in ("training_objectdataset.h5",
                  "training_objectdataset_augmentedrot_scale75.h5"):
        with h5py.File(tmp_path / fname, "w") as f:
            f["data"] = data
            f["label"] = labels
    cfg = ConfigDict.from_nested({"ROOT": str(tmp_path), "subset": "train"})
    for cls in (ScanObjectNN, ScanObjectNNHardest):
        ds = cls(cfg)
        assert len(ds) == 5
        _, _, (pts, label) = ds[3]
        assert pts.shape == (24, 3) and label == 1
        # train shuffle permutes rows but preserves the point set
        np.testing.assert_allclose(np.sort(pts.ravel()),
                                   np.sort(data[3].ravel()))


# -------------------------------------------------------------- ShapeNetPart
def test_partnormal_dataset(tmp_path):
    from upp_tpu.data.partnormal import PartNormalDataset
    root = tmp_path / "part"
    (root / "02691156").mkdir(parents=True)
    (root / "train_test_split").mkdir()
    (root / "synsetoffset2category.txt").write_text("Airplane\t02691156\n")
    for i, split in enumerate(("train", "val", "test")):
        mid = f"model{i}"
        data = np.concatenate(
            [_cloud(30, 3), _cloud(30, 3),
             rng.integers(0, 4, (30, 1)).astype(np.float32)], axis=1)
        np.savetxt(root / "02691156" / f"{mid}.txt", data)
        (root / "train_test_split" /
         f"shuffled_{split}_file_list.json").write_text(
            json.dumps([f"shape_data/02691156/{mid}"]))
    cfg = ConfigDict.from_nested({"DATA_PATH": str(root), "N_POINTS": 16,
                                  "subset": "trainval"})
    ds = PartNormalDataset(cfg)
    assert len(ds) == 2                       # train ∪ val
    pts, cls, seg = ds[0]
    assert pts.shape == (16, 3) and cls.shape == (1,) and seg.shape == (16,)
    assert set(np.unique(seg)).issubset(set(range(4)))
    cfg_t = ConfigDict.from_nested({"DATA_PATH": str(root), "N_POINTS": 16,
                                    "subset": "test"})
    assert len(PartNormalDataset(cfg_t)) == 1


# -------------------------------------------------- Projected_ShapeNet pairs
def test_projected_shapenet_both_tasks(tmp_path):
    from upp_tpu.data.projected_shapenet import ProjectedShapeNetDataset
    root = tmp_path / "proj"
    comp = root / "complete"
    part = root / "partial"
    comp.mkdir(parents=True); part.mkdir()
    (root / "test.txt").write_text("02691156-m1.npy\n03001627-m2.npy\n")
    for tax, mid in (("02691156", "m1"), ("03001627", "m2")):
        np.save(comp / f"{tax}-{mid}.npy", _cloud(48))
        np.save(part / f"{tax}-{mid}-0.npy", _cloud(24))
    base = {"DATA_PATH": str(root),
            "PARTIAL_POINTS_PATH": str(part / "%s-%s-%d.npy"),
            "COMPLETE_POINTS_ROOT": str(comp), "N_POINTS": 48,
            "subset": "test"}
    ds = ProjectedShapeNetDataset(
        ConfigDict.from_nested(dict(base, TASK="classification")))
    assert len(ds) == 2
    tax, mid, (partial, label) = ds[1]
    assert partial.shape == (24, 3) and label == 1
    dc = ProjectedShapeNetDataset(
        ConfigDict.from_nested(dict(base, TASK="completion")))
    _, _, (partial, gt) = dc[0]
    assert partial.shape == (24, 3) and gt.shape == (48, 3)


# ------------------------------------------------------------- RealSensor pcd
PCD_HEADER = """# .PCD v0.7 - Point Cloud Data file format
VERSION 0.7
FIELDS x y z
SIZE 4 4 4
TYPE F F F
COUNT 1 1 1
WIDTH {n}
HEIGHT 1
VIEWPOINT 0 0 0 1 0 0 0
POINTS {n}
DATA ascii
"""


def _write_pcd(path, pts):
    with open(path, "w") as f:
        f.write(PCD_HEADER.format(n=len(pts)))
        for p in pts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")


def test_realsensor_pcd_tree(tmp_path):
    from upp_tpu.data.realsensor import RealSensorDataset
    root = tmp_path / "scans"
    (root / "airplane").mkdir(parents=True)
    (root / "chair").mkdir()
    _write_pcd(root / "airplane" / "a.pcd", _cloud(20))
    _write_pcd(root / "chair" / "c.pcd", _cloud(4))   # < npoints → zero-pad
    names = tmp_path / "names.txt"
    names.write_text("airplane\nchair\n")
    cfg = ConfigDict.from_nested({"DATA_PATH": str(root), "N_POINTS": 8,
                                  "CLASS_NAMES": str(names)})
    ds = RealSensorDataset(cfg)
    assert len(ds) == 2
    _, _, (pts, label) = ds[0]
    assert pts.shape == (8, 3) and label == 0          # FPS-downsampled
    _, _, (pts2, label2) = ds[1]
    assert pts2.shape == (8, 3) and label2 == 1
    assert np.all(pts2[4:] == 0)                       # zero-padded tail


def test_io_ascii_ply(tmp_path):
    from upp_tpu.data.io import IO
    ply = tmp_path / "c.ply"
    ply.write_text("ply\nformat ascii 1.0\nelement vertex 3\n"
                   "property float x\nproperty float y\nproperty float z\n"
                   "end_header\n0 0 0\n1 0 0\n0 1 0\n")
    pts = IO.get(str(ply))
    assert pts.shape == (3, 3)
    np.testing.assert_allclose(pts[1], [1, 0, 0])


def test_few_shot_cli_flags_reach_dataset(modelnet_root, tmp_path):
    """--way/--shot/--fold reach the ModelNetFewShot dataset config through
    main.py (the reference parses the flags but never forwards them, so its
    few-shot dataset is unreachable from the CLI)."""
    import subprocess
    import sys

    import yaml

    from upp_tpu.data.generate_few_shot import generate

    out = str(tmp_path / "fewshot")
    generate(modelnet_root, out, way=2, shot=1, folds=1, npoints=64)
    ds_base = {"NAME": "ModelNetFewShot", "DATA_PATH": out, "N_POINTS": 64}
    cfg = {
        "optimizer": {"type": "AdamW", "kwargs": {"lr": 5e-4,
                                                  "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 2,
                                                  "initial_epochs": 0}},
        "dataset": {s: {"_base_": dict(ds_base),
                        "others": {"subset": "train" if s == "train"
                                   else "test"}}
                    for s in ("train", "val", "test")},
        "model": {"NAME": "PointTransformer", "trans_dim": 48, "depth": 2,
                  "drop_path_rate": 0.1, "cls_dim": 2, "num_heads": 4,
                  "group_size": 8, "num_group": 16, "encoder_dims": 48},
        "npoints": 32, "total_bs": 2, "step_per_update": 1, "max_epoch": 0,
        "task": "classification", "noisy_train": False,
        "noisy_validate": False, "grad_norm_clip": 10,
    }
    cfg_path = tmp_path / "fewshot_cls.yaml"
    yaml.dump(cfg, open(cfg_path, "w"))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    # force the CPU backend in-Python: the session sitecustomize pins the
    # tunneled TPU platform and ignores JAX_PLATFORMS (verify-skill gotcha)
    launcher = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import runpy, sys; sys.argv = sys.argv[1:];"
        "runpy.run_path(sys.argv[0], run_name='__main__')")
    r = subprocess.run(
        [sys.executable, "-c", launcher,
         os.path.join(repo, "main.py"), "--finetune_model",
         "--config", str(cfg_path), "--exp_name", "fs",
         "--way", "2", "--shot", "1", "--fold", "0"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    # the run trained on the 2way_1shot/0.pkl split and checkpointed
    exp = list(tmp_path.glob("experiments/**/ckpt-last"))
    assert exp, r.stdout[-2000:]


def test_synthetic_sensor_noise_options():
    """NOISE_OUTLIERS replaces the last m surface points with shell outliers
    (radius 1.05-1.5) and NOISE_JITTER adds per-point N(0, sigma) — both
    deterministic per index, so a noisy real-scan eval set (the two-phase
    rehearsal's test split) is reproducible."""
    from upp_tpu.data.synthetic import SyntheticDataset
    from upp_tpu.utils.config import ConfigDict

    base = dict(N_POINTS=256, NUM_CATEGORY=4, SIZE=8, subset="test")
    clean = SyntheticDataset(ConfigDict.from_nested(base))
    noisy = SyntheticDataset(ConfigDict.from_nested(
        dict(base, NOISE_OUTLIERS=12, NOISE_JITTER=0.01)))

    _, _, (pc, _) = clean[3]
    _, _, (pn, label) = noisy[3]
    assert pn.shape == pc.shape == (256, 3)
    r = np.linalg.norm(pn, axis=1)
    # the last 12 points are shell outliers, everything else near the surface
    assert (r[-12:] > 1.04).all() and (r[-12:] < 1.51).all()
    assert (r[:-12] < 1.04).all()
    # jitter is small: non-outlier points stay close to the clean sample
    assert np.abs(pn[:-12] - pc[:-12]).max() < 0.06
    # deterministic per index
    _, _, (pn2, label2) = noisy[3]
    np.testing.assert_array_equal(pn, pn2)
    assert label == label2
