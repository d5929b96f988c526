"""Observability utilities: plots write files, EMA math, debug switches."""

import os

import numpy as np

from meant_tpu.utils.observability import (ema_smooth, plot_f1_scatter,
                                           plot_loss_curve,
                                           save_confusion_matrix,
                                           summary_writer)


def test_ema_smooth():
    out = ema_smooth([1.0, 1.0, 1.0], alpha=0.9)
    np.testing.assert_allclose(out, [1.0, 1.0, 1.0])
    out2 = ema_smooth([0.0, 1.0], alpha=0.5)
    assert out2[1] == 0.5


def test_plots_write_files(tmp_path):
    plot_loss_curve([3.0, 2.0, 1.5, 1.4], str(tmp_path / "loss.png"))
    plot_f1_scatter([0.5, 0.6, 0.7], str(tmp_path / "f1.png"))
    save_confusion_matrix(np.array([[5, 1], [2, 8]]),
                          str(tmp_path / "cm.png"), title="test")
    for f in ("loss.png", "f1.png", "cm.png"):
        assert (tmp_path / f).stat().st_size > 0


def test_summary_writer_fallback():
    w = summary_writer("test_model", root="/tmp/meant_tpu_runs")
    w.add_scalar("charts/loss", 1.0, 0)
    w.close()
