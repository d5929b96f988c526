"""Tracing / profiling / debugging / plotting.

The reference's observability is ad-hoc (SURVEY.md §5.1-5.2, §5.5): wall-clock
prints, CUDA-event probes, DebugUnderflowOverflow behind --debug, EMA loss
curves and confusion-matrix PNGs, TensorBoard scalars, wandb opt-in. TPU
equivalents, strictly better where cheap:

  * profile_trace(): jax.profiler trace context (view in TensorBoard/XProf) —
    replaces torch-less wall-clock timing with real device timelines.
  * set_debug_nans(): jax_debug_nans config — the `detect_anomaly` /
    DebugUnderflowOverflow switch (`in_loop_train.py:21,42,187-188`).
  * plot_loss_curve(): EMA-smoothed curve (`in_loop_train.py:152-164`).
  * plot_f1_scatter(): per-epoch F1 scatter (`in_loop_train.py:167-183`).
  * save_confusion_matrix(): matplotlib heatmap
    (`src/utils/torchUtils.py:17-24`, seaborn-free).
  * summary_writer(): TensorBoard SummaryWriter (same `runs/{model}` layout,
    `pretrain_mlm.py:148`); wandb_init(): opt-in tracking
    (`pretrain_mlm.py:145-147`) — both no-ops when unavailable.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional, Sequence

import numpy as np

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/meant_tpu_trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def set_debug_nans(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)


def ema_smooth(values: Sequence[float], alpha: float = 0.9) -> np.ndarray:
    """EMA smoothing used for the reference's loss plots
    (`in_loop_train.py:152-164`)."""
    out = np.empty(len(values))
    acc = None
    for i, v in enumerate(values):
        acc = v if acc is None else alpha * acc + (1 - alpha) * v
        out[i] = acc
    return out


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_loss_curve(losses: Sequence[float], path: str, alpha: float = 0.9):
    plt = _plt()
    fig, ax = plt.subplots()
    ax.plot(losses, alpha=0.3, label="loss")
    ax.plot(ema_smooth(losses, alpha), label="ema")
    ax.set_xlabel("step")
    ax.set_ylabel("loss")
    ax.legend()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)


def plot_f1_scatter(f1s: Sequence[float], path: str):
    plt = _plt()
    fig, ax = plt.subplots()
    ax.scatter(np.arange(len(f1s)), f1s)
    ax.set_xlabel("epoch")
    ax.set_ylabel("macro F1")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)


def save_confusion_matrix(cm: np.ndarray, path: str, title: str = ""):
    plt = _plt()
    cm = np.asarray(cm)
    fig, ax = plt.subplots()
    im = ax.imshow(cm, cmap="Blues")
    for i in range(cm.shape[0]):
        for j in range(cm.shape[1]):
            ax.text(j, i, f"{int(cm[i, j])}", ha="center", va="center")
    ax.set_xlabel("predicted")
    ax.set_ylabel("target")
    if title:
        ax.set_title(title)
    fig.colorbar(im)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path)
    plt.close(fig)


def summary_writer(model_name: str, root: str = "runs"):
    try:
        from torch.utils.tensorboard import SummaryWriter
        return SummaryWriter(os.path.join(root, model_name))
    except Exception as e:
        print(f"[observability] tensorboard unavailable: {e}")

        class _Null:
            def add_scalar(self, *a, **k):
                pass

            def close(self):
                pass

        return _Null()


def wandb_init(project: str, name: str, entity: Optional[str] = None):
    try:
        import wandb
        return wandb.init(project=project, entity=entity,
                          sync_tensorboard=True, name=name, save_code=True)
    except Exception as e:
        print(f"[observability] wandb unavailable: {e}")
        return None
