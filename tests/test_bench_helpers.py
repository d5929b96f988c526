"""bench.py measurement-instrument helpers (VERDICT r4 next #2): stall
detection/re-timing and multi-batch staging are correctness-critical — a
poisoned mean in BENCH_r*.json misstates the repo's headline record."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


class TestTimedWindows:
    def test_clean_run_no_reruns(self):
        calls = []

        def run_window(k):
            calls.append(k)
            return (k * 4, 0.1, k)

        samples, dt, p50, n = bench.timed_windows(run_window, steps=20,
                                                  windows=5)
        assert n == 0 and len(calls) == 5
        assert samples == 80 and abs(dt - 0.5) < 1e-9
        assert abs(p50 - 25.0) < 1e-9     # 0.1s / 4 steps = 25 ms/step

    def test_stall_is_retimed_not_published(self):
        state = {"i": 0}

        def run_window(k):
            state["i"] += 1
            dt = 1.0 if state["i"] == 2 else 0.1   # window 2 stalls once
            return (k * 4, dt, k)

        samples, dt, p50, n = bench.timed_windows(run_window, steps=20,
                                                  windows=5)
        assert n == 1                       # re-timed exactly once
        assert dt < 0.6                     # the 1.0s ghost never lands
        assert abs(p50 - 25.0) < 1e-9

    def test_persistent_stall_dropped_after_budget(self):
        # window 2 is slow on EVERY re-time (a persistent environmental
        # problem, not a one-off stall) — after the rerun budget it must be
        # dropped from the published mean, not averaged in
        seq = [0.1, 1.0, 0.1, 0.1, 0.1] + [1.0] * 10
        it = iter(seq)

        def rw(k):
            return (k * 4, next(it), k)

        samples, dt, p50, n = bench.timed_windows(rw, steps=20, windows=5,
                                                  rerun_budget=3)
        assert n == 3                       # budget spent
        assert abs(p50 - 25.0) < 1e-9       # published p50 excludes it
        assert samples == 64                # the still-slow window dropped

    def test_small_step_counts_clamp(self):
        samples, dt, p50, n = bench.timed_windows(
            lambda k: (k, 0.01, k), steps=2, windows=5)
        assert samples == 2                 # 2 windows of 1 step


class TestStageBatches:
    def test_pairing_and_distinctness(self):
        data = {"x": np.arange(16), "y": np.arange(16) * 10}
        out = bench.stage_batches(data, lambda d: d, nb=4)
        assert len(out) == 4
        np.testing.assert_array_equal(out[0]["x"], np.arange(16))
        for d in out:
            np.testing.assert_array_equal(d["y"], d["x"] * 10)  # pairing
        assert not np.array_equal(out[1]["x"], out[2]["x"])
