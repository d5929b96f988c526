"""Device-side classification metrics.

Replaces the reference's per-step `out.detach().cpu()` + torchmetrics sync
(`in_loop_train.py:240-241` — a known throughput sink, SURVEY.md §3.1) with a
confusion-matrix accumulator that lives on device: the jitted step returns a
(num_classes, num_classes) int32 delta, summed into a host-held device array.
Accuracy / macro- & micro-F1 / precision / recall / MCC all derive from the
matrix at epoch end; AUROC is computed exactly from collected scores (eval
loaders only — tiny) via the rank-statistic formulation.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def confusion_delta(probs: jnp.ndarray, labels: jnp.ndarray,
                    num_classes: int) -> jnp.ndarray:
    """One-batch confusion matrix. probs: (b, C) scores; labels: (b,) int."""
    preds = jnp.argmax(probs, axis=-1)
    idx = labels.astype(jnp.int32) * num_classes + preds.astype(jnp.int32)
    cm = jnp.zeros((num_classes * num_classes,), jnp.int32)
    cm = cm.at[idx].add(1)
    return cm.reshape(num_classes, num_classes)


def metrics_from_confusion(cm: np.ndarray) -> dict:
    """torchmetrics-compatible multiclass metrics from a confusion matrix
    (rows = target, cols = prediction)."""
    cm = np.asarray(cm, dtype=np.float64)
    total = cm.sum()
    tp = np.diag(cm)
    support = cm.sum(axis=1)      # per true class
    predicted = cm.sum(axis=0)    # per predicted class
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(predicted > 0, tp / predicted, 0.0)
        recall = np.where(support > 0, tp / support, 0.0)
        f1 = np.where(precision + recall > 0,
                      2 * precision * recall / (precision + recall), 0.0)
    accuracy = tp.sum() / max(total, 1)
    # micro precision == micro recall == micro f1 == accuracy for multiclass
    # MCC (multiclass, from the confusion matrix)
    s = total
    c = tp.sum()
    sum_pk_tk = (predicted * support).sum()
    denom = np.sqrt(max(s**2 - (predicted**2).sum(), 0)) * \
        np.sqrt(max(s**2 - (support**2).sum(), 0))
    mcc = (c * s - sum_pk_tk) / denom if denom > 0 else 0.0
    return {
        "accuracy": float(accuracy),
        "f1_macro": float(f1.mean()),
        "f1_micro": float(accuracy),
        "precision_macro": float(precision.mean()),
        "precision_micro": float(accuracy),
        "recall_macro": float(recall.mean()),
        "recall_micro": float(accuracy),
        "mcc": float(mcc),
        "per_class_f1": f1.tolist(),
        "confusion": cm.tolist(),
    }


def binary_auroc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Exact AUROC via the Mann-Whitney rank statistic. scores: positive-class
    score per sample."""
    scores = np.asarray(scores, dtype=np.float64)
    labels = np.asarray(labels)
    pos = scores[labels == 1]
    neg = scores[labels == 0]
    if len(pos) == 0 or len(neg) == 0:
        return 0.0
    all_scores = np.concatenate([neg, pos])
    order = np.argsort(all_scores, kind="mergesort")
    # average ranks for ties
    _, inv, counts = np.unique(all_scores[order], return_inverse=True,
                               return_counts=True)
    cum = np.concatenate([[0], np.cumsum(counts)])
    avg = (cum[:-1] + cum[1:] + 1) / 2.0
    ranks = np.empty(len(order), dtype=np.float64)
    ranks[order] = avg[inv]
    r_pos = ranks[len(neg):].sum()
    auc = (r_pos - len(pos) * (len(pos) + 1) / 2) / (len(pos) * len(neg))
    return float(auc)


class F1Metrics:
    """Stateful wrapper mirroring `utils/f1_metrics.py:6-59` (same printout
    labels), accumulating on device."""

    def __init__(self, num_classes: int, set_name: str):
        self.num_classes = num_classes
        self.set_name = set_name
        self.cm = jnp.zeros((num_classes, num_classes), jnp.int32)
        self._scores = []
        self._labels = []

    def update(self, probs, labels, collect_scores: bool = False):
        self.cm = self.cm + confusion_delta(probs, labels, self.num_classes)
        if collect_scores:
            self._scores.append(np.asarray(probs))
            self._labels.append(np.asarray(labels))

    def update_cm(self, cm_delta):
        self.cm = self.cm + cm_delta

    def compute(self) -> dict:
        m = metrics_from_confusion(np.asarray(self.cm))
        if self._scores and self.num_classes == 2:
            scores = np.concatenate(self._scores)[:, 1]
            labels = np.concatenate(self._labels)
            m["auroc"] = binary_auroc(scores, labels)
        return m

    def show(self, _class=None):
        m = self.compute()
        print(self.set_name + " accuracy: ", m["accuracy"])
        print("Macro " + self.set_name + " f1: ", m["f1_macro"])
        print("Micro " + self.set_name + " f1: ", m["f1_micro"])
        print("Macro " + self.set_name + " precision: ", m["precision_macro"])
        print("Micro " + self.set_name + " precision: ", m["precision_micro"])
        print("Macro " + self.set_name + " recall: ", m["recall_macro"])
        print("Micro " + self.set_name + " recall: ", m["recall_micro"])
        return m["f1_macro"], m["f1_micro"]
