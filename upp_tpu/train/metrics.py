"""Metrics: classification loss/acc, pretask CD metrics, seg mIoU, F-score.

Replaces ``get_loss_acc`` (``models/Point_MAE_unify.py:499-503``),
``Acc_Metric``/``CD_Metric`` (``tools/runner_pretask.py:32-66``), the inline
mIoU computation (``tools/runner_unify_seg.py:301-368``) and ``utils/metrics.py``
(F-Score / CDL1 / CDL2)."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.chamfer import chamfer_l1, chamfer_l2, nn_distance


def cross_entropy_loss_acc(logits: jnp.ndarray, labels: jnp.ndarray):
    """CE loss + accuracy*100 (``Point_MAE_unify.py:499-503``)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                                         axis=-1))
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32)) * 100.0
    return loss, acc


def nll_seg_loss(log_probs: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """NLL over per-point log-probs (``Point_MAE_unify_segment.py:619-625``)."""
    picked = jnp.take_along_axis(log_probs, target[..., None].astype(jnp.int32),
                                 axis=-1)
    return -jnp.mean(picked)


class AccMetric:
    """Comparable accuracy holder (``tools/runner.py:13-31``)."""

    def __init__(self, acc: float = 0.0):
        self.acc = float(acc)

    def better_than(self, other: "AccMetric") -> bool:
        return self.acc > other.acc

    def state_dict(self) -> Dict[str, float]:
        return {"acc": self.acc}

    def __repr__(self):
        return f"AccMetric(acc={self.acc:.4f})"


class CDMetric:
    """Lower-is-better Chamfer metric holder (``runner_pretask.py:49-66``)."""

    def __init__(self, cd: float = float("inf")):
        self.cd = float(cd)

    def better_than(self, other: "CDMetric") -> bool:
        return self.cd < other.cd

    def state_dict(self) -> Dict[str, float]:
        return {"cd": self.cd}

    def __repr__(self):
        return f"CDMetric(cd={self.cd:.6f})"


def fscore(pred: jnp.ndarray, gt: jnp.ndarray, threshold: float = 0.01):
    """F-Score@threshold (``utils/metrics.py:70-101``; open3d distances →
    our nn_distance)."""
    d1, _, d2, _ = nn_distance(pred, gt)
    d1, d2 = jnp.sqrt(d1), jnp.sqrt(d2)
    recall = jnp.mean((d2 < threshold).astype(jnp.float32), axis=-1)
    precision = jnp.mean((d1 < threshold).astype(jnp.float32), axis=-1)
    return jnp.where(recall + precision > 0,
                     2 * recall * precision / (recall + precision + 1e-12), 0.0)


def completion_metrics(pred: jnp.ndarray, gt: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """F-Score / CDL1*1000 / CDL2*1000 table entries (``utils/metrics.py:37-44``)."""
    return {
        "F-Score": jnp.mean(fscore(pred, gt)),
        "CDL1": chamfer_l1(pred, gt) * 1000.0,
        "CDL2": chamfer_l2(pred, gt) * 1000.0,
    }


def seg_miou_metrics(preds: np.ndarray, targets: np.ndarray,
                     cls_labels: np.ndarray,
                     seg_classes: Dict[str, Sequence[int]]) -> Dict[str, float]:
    """ShapeNetPart mIoU suite (``tools/runner_unify_seg.py:301-368``):
    accuracy, class-avg accuracy, class-avg mIoU, instance-avg mIoU.

    Args:
      preds/targets: [num_samples, N] int part labels (preds already argmaxed
        *within* each object's category part range, as the reference does).
      cls_labels: [num_samples] int category index.
    """
    cat_names = list(seg_classes.keys())
    shape_ious: Dict[str, list] = {c: [] for c in cat_names}
    label_to_cat = {}
    for cat, parts in seg_classes.items():
        for p in parts:
            label_to_cat[p] = cat

    total_correct = 0
    total_seen = 0
    seen_per_cat = np.zeros(len(cat_names))
    correct_per_cat = np.zeros(len(cat_names))

    for i in range(preds.shape[0]):
        seg_pred, seg_gt = preds[i], targets[i]
        cat = label_to_cat[int(seg_gt[0])]
        total_correct += int((seg_pred == seg_gt).sum())
        total_seen += seg_gt.size
        ci = cat_names.index(cat)
        seen_per_cat[ci] += seg_gt.size
        correct_per_cat[ci] += int((seg_pred == seg_gt).sum())

        part_ious = []
        for part in seg_classes[cat]:
            p_and = np.sum((seg_gt == part) & (seg_pred == part))
            p_or = np.sum((seg_gt == part) | (seg_pred == part))
            part_ious.append(1.0 if p_or == 0 else p_and / float(p_or))
        shape_ious[cat].append(np.mean(part_ious))

    all_ious = [iou for vals in shape_ious.values() for iou in vals]
    cat_ious = {c: np.mean(v) for c, v in shape_ious.items() if v}
    return {
        "accuracy": total_correct / max(total_seen, 1),
        "class_avg_accuracy": float(np.mean(
            correct_per_cat[seen_per_cat > 0] / seen_per_cat[seen_per_cat > 0])),
        "class_avg_iou": float(np.mean(list(cat_ious.values()))) if cat_ious else 0.0,
        "instance_avg_iou": float(np.mean(all_ious)) if all_ious else 0.0,
        "per_category_iou": {c: float(v) for c, v in cat_ious.items()},
    }


class Metrics:
    """Pluggable completion-metric table (reference ``utils/metrics.py``):
    F-Score@0.01 (higher better), CDL1/CDL2 ×1000 (lower better). The
    reference's EMD entry is defined but disabled (``metrics.py:37-44``);
    here it is available via ``require_emd=True``."""

    ITEMS = [
        {"name": "F-Score", "higher_better": True},
        {"name": "CDL1", "higher_better": False},
        {"name": "CDL2", "higher_better": False},
    ]

    @classmethod
    def names(cls):
        return [item["name"] for item in cls.ITEMS]

    @classmethod
    def get(cls, pred, gt, require_emd: bool = False):
        vals = completion_metrics(jnp.asarray(pred), jnp.asarray(gt))
        out = [float(vals[n]) for n in cls.names()]
        if require_emd:
            from ..ops.emd import earth_mover_distance
            out.append(float(earth_mover_distance(jnp.asarray(pred),
                                                  jnp.asarray(gt))) * 1000.0)
        return out

    @classmethod
    def better_than(cls, name: str, a: float, b: float) -> bool:
        spec = next(i for i in cls.ITEMS if i["name"] == name)
        return a > b if spec["higher_better"] else a < b


class AverageMeter:
    """Multi-item running averages (``utils/AverageMeter.py``)."""

    def __init__(self, items=None):
        self.items = items
        self.n = 1 if items is None else len(items)
        self.reset()

    def reset(self):
        self._val = [0.0] * self.n
        self._sum = [0.0] * self.n
        self._count = [0] * self.n

    def update(self, values):
        if not isinstance(values, (list, tuple)):
            values = [values]
        for i, v in enumerate(values):
            self._val[i] = float(v)
            self._sum[i] += float(v)
            self._count[i] += 1

    def update_vectors(self, vectors):
        """Batched update: each entry is a per-sample vector; accumulates
        sum + sample count so averages weight a partial trailing batch by
        its size (identical to updating one sample at a time)."""
        for i, v in enumerate(vectors):
            v = np.asarray(v).reshape(-1)
            self._val[i] = float(v.mean()) if v.size else self._val[i]
            self._sum[i] += float(v.sum())
            self._count[i] += int(v.size)

    def val(self, idx=None):
        return self._val if idx is None else self._val[idx]

    def count(self, idx=None):
        return self._count if idx is None else self._count[idx]

    def avg(self, idx=None):
        avgs = [self._sum[i] / max(self._count[i], 1) for i in range(self.n)]
        return avgs if idx is None else avgs[idx]
