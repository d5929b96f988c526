"""Regression guard for the production soak driver (`scripts/soak.py`).

The soak is the committed evidence that the whole *system* — real input
pipeline, jitted step, per-epoch eval + orbax checkpoint, a planted
SIGKILL mid-epoch and an `--epoch` resume — holds at steady state
(reference anchor: the multi-epoch `length:` logs in
`/root/reference/src/slurm-*.out`). This test runs the full driver
(kill + resume + all steady-state asserts) end-to-end on CPU at a tiny
geometry so the orchestration logic can't rot. The on-chip execution is
documented in docs/soak_chip.md.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.heavy

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SOAK = os.path.join(REPO, "scripts", "soak.py")


def test_soak_driver_kill_resume_cpu(tmp_path):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["MEANT_TPU_NO_COMPILE_CACHE"] = "1"
    proc = subprocess.run(
        [sys.executable, SOAK, "--epochs", "3", "--n", "64", "--batch",
         "8", "--nec", "1", "--seq", "64", "--kill_at_step", "2",
         "--out", str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-4000:]
    assert "SOAK PASS" in proc.stdout

    recs = [json.loads(l) for l in open(tmp_path / "soak_log.jsonl")]
    events = [r["event"] for r in recs]
    # two processes (pre-kill + resumed), the planted kill, full epoch
    # coverage exactly once, and a final test eval
    assert events.count("start") == 2
    assert events.count("kill") == 1
    epochs = sorted(r["epoch"] for r in recs if r["event"] == "epoch")
    assert epochs == [0, 1, 2]
    assert events[-1] == "done"


def test_soak_driver_rejects_unreachable_kill_step(tmp_path):
    # the planted kill must land on a step that exists (4 steps/epoch
    # here) — the driver refuses instead of silently never killing
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, SOAK, "--epochs", "3", "--n", "64", "--batch",
         "8", "--nec", "1", "--seq", "64", "--kill_at_step", "10",
         "--out", str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=120)
    assert proc.returncode != 0
    assert "never fires" in proc.stdout
