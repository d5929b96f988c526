"""Baseline-model harness — rebuild of `run_other_models.py` (same flags as
in_loop_train; models: bertweet / vl_bert / vilt / teanet / mlp / lstm).
The reference runs baselines on the target day only and trains with the same
AMP loop + metrics (`run_other_models.py:59-105,247-249`)."""

from __future__ import annotations

from meant_tpu.cli.in_loop_train import main as _main


def main(argv=None):
    # identical pipeline; the model registry + trainer dispatch handle the
    # baseline signatures (target-day-only inputs for HF-style baselines).
    return _main(argv)


if __name__ == "__main__":
    main()
