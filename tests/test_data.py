"""Data-engineering tests: MACD/RSI math vs pandas, SMOTE, VQA utilities,
splits and dataset builders."""

import os

import numpy as np
import pandas as pd
import pytest

from meant_tpu.data import (crossover_labels, ema, hash_tokenize, lag_windows,
                            macd_signal, rsi, smote, smote_lag_windows,
                            split_arrays, stocknet_from_frame,
                            synthetic_tempstock, tempstock_large_from_frame,
                            train_val_test_split)
from meant_tpu.data.macd import tempstock_price_features
from meant_tpu.data.vqa import (build_label2id, center_pad_images, get_score,
                                pad_text, soft_targets, vqa_collate)


class TestMACD:
    def test_ema_matches_pandas(self):
        x = np.random.RandomState(0).rand(100) * 50 + 100
        mine = ema(x, 12)
        ref = pd.Series(x).ewm(span=12, adjust=False).mean().to_numpy()
        np.testing.assert_allclose(mine, ref, rtol=1e-12)

    def test_macd_components(self):
        x = np.random.RandomState(1).rand(200) * 50 + 100
        macd, sig, hist = macd_signal(x)
        ref_macd = (pd.Series(x).ewm(span=12, adjust=False).mean()
                    - pd.Series(x).ewm(span=26, adjust=False).mean())
        np.testing.assert_allclose(macd, ref_macd.to_numpy(), rtol=1e-10)
        np.testing.assert_allclose(hist, macd - sig, rtol=1e-12)

    def test_rsi_bounds_and_wilder(self):
        x = np.cumsum(np.random.RandomState(2).randn(300)) + 100
        r = rsi(x)
        assert ((r >= 0) & (r <= 100)).all()
        # monotone rally -> RSI ~ 100
        up = np.arange(100, 200, dtype=float)
        assert rsi(up)[-1] > 99.0

    def test_crossover_label_rule(self):
        # construct macd crossing signal upward into positive territory
        macd = np.array([0.0] * 27 + [-1.0, 0.5])
        sig = np.array([0.0] * 27 + [0.0, 0.0])
        feats, labels = crossover_labels(macd, sig, start=28)
        assert labels.shape == (1, 2)
        assert labels[0, 1] == 1  # buy
        # same cross but macd stays negative -> no buy
        macd2 = np.array([0.0] * 27 + [-1.0, -0.1])
        sig2 = np.array([0.0] * 27 + [-0.5, -0.2])
        _, labels2 = crossover_labels(macd2, sig2, start=28)
        assert labels2[0, 0] == 1

    def test_tempstock_price_features_shape(self):
        x = np.random.RandomState(3).rand(60) + 100
        f = tempstock_price_features(x)
        assert f.shape == (60, 5)
        # MACD column == EMA12 - EMA26
        np.testing.assert_allclose(f[:, 4], f[:, 0] - f[:, 1], atol=1e-4)

    def test_lag_windows(self):
        feats = np.arange(10)[:, None].astype(np.float32)
        labels = np.arange(10).astype(np.int32)
        w, l = lag_windows(feats, labels, lag=5)
        assert w.shape == (6, 5, 1)
        assert (l == np.arange(4, 10)).all()
        assert (w[0, :, 0] == np.arange(5)).all()


class TestSMOTE:
    def test_balances_classes(self):
        rng = np.random.RandomState(0)
        X = np.concatenate([rng.randn(90, 8), rng.randn(10, 8) + 5])
        y = np.array([0] * 90 + [1] * 10)
        X2, y2 = smote(X, y)
        assert (y2 == 1).sum() == (y2 == 0).sum() == 90
        # synthetic minority points live near the minority cluster
        assert X2[y2 == 1].mean() > 3.0

    def test_lag_window_roundtrip(self):
        rng = np.random.RandomState(1)
        g = rng.randn(20, 5, 2, 4, 4).astype(np.float32)
        t = rng.randn(20, 5, 8).astype(np.float32)
        m = rng.randn(20, 5, 4).astype(np.float32)
        y = np.array([0] * 15 + [1] * 5)
        g2, t2, m2, y2 = smote_lag_windows(g, t, m, y)
        assert g2.shape[1:] == g.shape[1:]
        assert len(y2) == 30


class TestVQA:
    def test_get_score(self):
        assert get_score(0) == 0
        assert get_score(2) == 2 / 3
        assert get_score(5) == 1.0

    def test_soft_targets(self):
        l2i = build_label2id([["cat", "dog"], ["dog", "bird"]])
        t = soft_targets({"dog": 3, "bird": 1}, l2i)
        assert t[l2i["dog"]] == 1.0
        assert abs(t[l2i["bird"]] - 1 / 3) < 1e-6

    def test_collate_shapes(self):
        recs = [{"input_ids": [1, 2, 3], "image": np.ones((3, 10, 12)),
                 "soft_target": np.zeros(7)},
                {"input_ids": [4, 5], "image": np.ones((3, 16, 8)),
                 "soft_target": np.zeros(7)}]
        batch = vqa_collate(recs, 7, max_text_len=6, height=20, width=20)
        assert batch["language_input_ids"].shape == (2, 6)
        assert batch["pixel_values"].shape == (2, 3, 20, 20)
        assert batch["pixel_mask"].sum() == 10 * 12 + 16 * 8
        assert batch["attention_mask"][0].sum() == 3


class TestSplitsAndBuilders:
    def test_split_deterministic(self):
        a, b, c = train_val_test_split(100)
        a2, b2, c2 = train_val_test_split(100)
        assert (a == a2).all() and (b == b2).all() and (c == c2).all()
        assert len(a) == 60 and len(b) == 20 and len(c) == 20
        assert len(set(a) | set(b) | set(c)) == 100

    def test_split_matches_sklearn_exactly(self):
        """Membership AND order must equal the reference's two
        `train_test_split(random_state=42)` calls
        (`in_loop_train.py:607-621`) — real-data F1 comparisons depend on
        identical test-set membership (VERDICT r4 weak #1)."""
        sklearn = pytest.importorskip("sklearn")
        from sklearn.model_selection import train_test_split
        for n in (10, 11, 13, 37, 100, 101, 997):
            idx = np.arange(n)
            tr_val, te = train_test_split(idx, test_size=0.2,
                                          random_state=42)
            tr, va = train_test_split(tr_val, test_size=0.25,
                                      random_state=42)
            a, b, c = train_val_test_split(n)
            assert np.array_equal(a, tr), n
            assert np.array_equal(b, va), n
            assert np.array_equal(c, te), n

    def test_tempstock_large_builder(self):
        lag = 2
        rows = []
        for i in range(4):
            row = {"label": i % 2}
            for d in range(lag):
                row[f"text_{d}"] = f"hello world {i} {d}"
                for col in ("EMA12", "EMA26", "Signal_Line",
                            "MACD_Histogram", "MACD"):
                    row[f"{col}_{d}"] = float(i + d)
            rows.append(row)
        df = pd.DataFrame(rows)
        graphs = np.zeros((4, lag, 3, 8, 8), np.float32)
        out = tempstock_large_from_frame(df, graphs, hash_tokenize(1000, 16),
                                         lag=lag, max_len=16)
        assert out["input_ids"].shape == (4, lag, 16)
        assert out["prices"].shape == (4, lag, 5)
        assert (out["attention_mask"].sum(-1) > 0).all()

    def test_stocknet_builder(self):
        lag = 2
        rows = []
        for i in range(3):
            row = {"label": i % 2}
            for d in range(lag):
                row[f"text_{d}"] = f"tweet {i} {d}"
                for col in ("high", "low", "close"):
                    row[f"{col}_{d}"] = float(i)
            rows.append(row)
        df = pd.DataFrame(rows)
        out = stocknet_from_frame(df, hash_tokenize(1000, 8), lag=lag,
                                  max_len=8)
        assert out["tweets"].shape == (3, lag, 8)
        assert out["prices"].shape == (3, lag, 3)


class TestBucketedLoader:
    def _arrays(self, n=40, lag=5, s=512):
        rng = np.random.RandomState(0)
        lengths = rng.choice([60, 130, 300, 500], size=n)
        mask = np.zeros((n, lag, s), np.float32)
        for i, l in enumerate(lengths):
            mask[i, :, :l] = 1
        return {
            "input_ids": rng.randint(2, 100, (n, lag, s)).astype(np.int32),
            "attention_masks": mask,
            "pixels": rng.randn(n, lag, 3, 8, 8).astype(np.float32),
            "y": rng.randint(0, 2, n).astype(np.int32),
        }, lengths

    def test_batches_are_single_bucket_and_cover_content(self):
        from meant_tpu.data.loader import BucketedLoader
        arrays, lengths = self._arrays()
        loader = BucketedLoader(arrays, 4, buckets=(128, 256, 384, 512))
        seen = 0
        for batch in loader:
            s = batch["input_ids"].shape[-1]
            assert s in (128, 256, 384, 512)
            # no content truncated: every row's length fits the bucket
            assert batch["attention_masks"].sum(-1).max() <= s
            # non-seq arrays untouched
            assert batch["pixels"].shape[-1] == 8
            seen += len(batch["y"])
        assert seen == len(loader) * 4

    def test_short_content_gets_short_bucket(self):
        from meant_tpu.data.loader import BucketedLoader
        arrays, lengths = self._arrays()
        loader = BucketedLoader(arrays, 4, buckets=(128, 256, 384, 512))
        assert set(loader.assignment[lengths == 60]) == {128}
        assert set(loader.assignment[lengths == 500]) == {512}

    def test_len_counts_full_batches_per_bucket(self):
        from meant_tpu.data.loader import BucketedLoader
        arrays, _ = self._arrays(n=10)
        loader = BucketedLoader(arrays, 4, buckets=(128, 512))
        total = sum(1 for _ in loader)
        assert total == len(loader)

    def test_per_bucket_batch_sizes(self):
        """bucket_batches: short buckets draw LARGER batches (constant token
        budget); unlisted buckets fall back to batch_size; _weight matches
        each batch's actual row count."""
        from meant_tpu.data.loader import BucketedLoader
        arrays, lengths = self._arrays(n=64)
        loader = BucketedLoader(arrays, 4, buckets=(128, 256, 384, 512),
                                bucket_batches={128: 8, 256: 6})
        seen_bs = {}
        n_batches = 0
        for batch in loader:
            s = batch["input_ids"].shape[-1]
            bs = len(batch["y"])
            assert batch["_weight"].shape == (bs,)
            seen_bs.setdefault(s, set()).add(bs)
            n_batches += 1
        assert n_batches == len(loader)
        assert seen_bs[128] == {8} and seen_bs[256] == {6}
        for s in (384, 512):
            if s in seen_bs:
                assert seen_bs[s] == {4}
        # every bucket's full batches are all yielded
        counts = {128: 8, 256: 6, 384: 4, 512: 4}
        assign = loader.assignment
        want = sum(int((assign == b).sum()) // counts[b]
                   for b in (128, 256, 384, 512))
        assert n_batches == want

    def test_stray_bucket_batches_key_rejected(self):
        """A typo'd bucket_batches key must fail construction, not silently
        run that bucket at the default batch size (ADVICE r3)."""
        import pytest

        from meant_tpu.data.loader import BucketedLoader
        arrays, _ = self._arrays()
        with pytest.raises(ValueError, match="129"):
            BucketedLoader(arrays, 4, buckets=(128, 256, 384, 512),
                           bucket_batches={129: 8})

    def test_batch_divisor_enforced(self):
        """On a DP mesh every per-bucket batch must divide by the data-axis
        size; an indivisible entry fails at construction (ADVICE r3)."""
        import pytest

        from meant_tpu.data.loader import BucketedLoader
        arrays, _ = self._arrays()
        with pytest.raises(ValueError, match="divisible"):
            BucketedLoader(arrays, 4, buckets=(128, 256, 384, 512),
                           bucket_batches={128: 6}, batch_divisor=4)
        # divisible config constructs fine
        BucketedLoader(arrays, 4, buckets=(128, 256, 384, 512),
                       bucket_batches={128: 8}, batch_divisor=4)


def test_bench_length_histogram_sampler(tmp_path):
    """bench.sample_hist_lengths: range + point keys, mass-weighted draw,
    values clipped to [1, s_max]; the shipped uniform default reproduces
    the synthetic uniform 64-512 distribution."""
    import json
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import sample_hist_lengths

    rng = np.random.RandomState(0)
    # skewed-short histogram shaped like real tweet data
    p = tmp_path / "hist.json"
    p.write_text(json.dumps({"64-128": 70, "129-256": 25, "400": 5}))
    lengths = sample_hist_lengths(str(p), 4000, rng)
    assert lengths.min() >= 64 and lengths.max() <= 400
    short = (lengths <= 128).mean()
    assert 0.6 < short < 0.8          # ~70% mass in the short bin
    assert (lengths == 400).mean() > 0.01

    # the shipped uniform default file covers the full 64-512 range
    import meant_tpu
    default = os.path.join(os.path.dirname(meant_tpu.__file__), "configs",
                           "length_hist_uniform64_512.json")
    u = sample_hist_lengths(default, 4000, np.random.RandomState(1))
    assert u.min() >= 64 and u.max() <= 512
    # uniform 64-512 puts ~half the mass above the midpoint 288
    assert 0.45 < (u > 288).mean() < 0.55


def test_bench_budget_buckets_cli_gates(monkeypatch):
    """bench --budget_buckets: refuses outside src_bucketed, and refuses
    when no measured per-bucket table exists (the r4 on-chip sweep found
    b=16 optimal at every bucket, so BUDGET_BUCKET_BATCHES ships None);
    the refusal must cite the probe so the gate is actionable."""
    import sys

    import pytest

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    monkeypatch.setattr(sys, "argv",
                        ["bench.py", "--workload", "src512",
                         "--budget_buckets"])
    with pytest.raises(SystemExit, match="src_bucketed"):
        bench.main()

    assert bench.BUDGET_BUCKET_BATCHES is None  # measured: b16 wins all
    monkeypatch.setattr(sys, "argv",
                        ["bench.py", "--workload", "src_bucketed",
                         "--budget_buckets"])
    with pytest.raises(SystemExit, match="probe_bucket_batch"):
        bench.main()


def test_bench_full_mlm_head_cli_gate(monkeypatch):
    """bench --full_mlm_head: refuses outside the mlm workload, and the
    emitted metric string discloses which head layout actually ran
    (gathered = default exact-math optimization; full = the reference's
    literal all-positions compute)."""
    import sys

    import pytest

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    monkeypatch.setattr(sys, "argv",
                        ["bench.py", "--workload", "src512",
                         "--full_mlm_head"])
    with pytest.raises(SystemExit, match="workload mlm"):
        bench.main()

    assert "tied gathered head" in bench.build_mlm(batch=2)[4]
    assert "tied full head" in bench.build_mlm(batch=2, full_head=True)[4]


def test_bench_vqa_ner_builders_and_gates(monkeypatch):
    """bench --workload vqa/ner: builders emit honest metric labels at the
    reference geometry (VQA: s=40 questions, 3130-answer soft targets —
    DEFECTS #31 means the reference itself never ran this path; NER:
    s=256, 9 BIO tags, first-subword -100 labeling), and the flag gates
    refuse classifier-only options rather than silently mislabeling."""
    import sys

    import pytest

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    model, data, b, metric = bench.build_vqa(batch=2, num_encoders=1)
    assert b == 2 and "3130 answers" in metric
    assert data["labels"].shape == (2, 3130)
    assert data["language_input_ids"].shape == (2, 40)
    # soft targets: the hard answer carries 1.0, row max is 1.0
    assert float(data["labels"].max()) == 1.0

    kind, model, data, b, metric = bench.build_ner(batch=2)
    assert kind == "ner" and "9 BIO tags" in metric
    assert data["labels"].shape == (2, 256)
    assert (data["labels"][:, 0] == -100).all()   # specials unlabeled
    lab = data["labels"][data["labels"] != -100]
    assert lab.size and lab.min() >= 0 and lab.max() < 9

    monkeypatch.setattr(sys, "argv",
                        ["bench.py", "--workload", "vqa", "--eval"])
    with pytest.raises(SystemExit, match="vqa workload"):
        bench.main()
    monkeypatch.setattr(sys, "argv",
                        ["bench.py", "--workload", "ner", "--scan_layers"])
    with pytest.raises(SystemExit, match="RobertaModel"):
        bench.main()
    monkeypatch.setattr(sys, "argv",
                        ["bench.py", "--workload", "ner", "--accum", "2"])
    with pytest.raises(SystemExit, match="classifier-workload"):
        bench.main()


def test_bench_tweet_builder_and_gates(monkeypatch):
    """bench --workload tweet: builder emits the Stocknet run geometry
    (`in_loop_train.py:520-528`: lag 5, s=128, b32 train default — the
    config behind the A100 3.69 it/s train / 30.8 it/s b1-eval rows), and
    --fixed_proj (a meant_src fusion repair) refuses rather than silently
    mislabeling. The vs_baseline ratio policy is pinned by the constants:
    train compares at exactly b=32, eval at exactly b=1."""
    import sys

    import pytest

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    model, name, data, b, metric = bench.build_tweet(batch=2, num_encoders=1)
    assert name == "meant_tweet" and b == 2
    assert "Stocknet" in metric and "s=128" in metric
    assert data["tweets"].shape == (2, 5, 128)
    assert data["attention_masks"].shape == (2, 5, 128)
    # the A100 rates: tqdm it/s x the reference batch (in_loop_train.py:404)
    assert bench.STOCKNET_TRAIN_B32 == pytest.approx(3.69 * 32, abs=0.1)
    assert bench.STOCKNET_EVAL_B1 == pytest.approx(30.8)

    monkeypatch.setattr(sys, "argv",
                        ["bench.py", "--workload", "tweet", "--fixed_proj"])
    with pytest.raises(SystemExit, match="meant_tweet has none"):
        bench.main()


def test_bench_bucketed_builder_accepts_budget_table():
    """build_src_bucketed with a bucket_batches table: the loader draws
    the per-bucket sizes and every bucket fills at least one full batch
    (the path BUDGET_BUCKET_BATCHES flows through if a geometry where
    token-budget batching pays is ever measured)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import build_src_bucketed

    model, name, loader, b, metric = build_src_bucketed(
        batch=4, n=16, bucket_batches={128: 8, 256: 8})
    assert "token-budget" in metric
    assert loader._bucket_bs(128) == 8 and loader._bucket_bs(512) == 4
    sizes = {}
    for batch_out in loader:
        s_b = int(batch_out["attention_masks"].shape[-1])
        sizes.setdefault(s_b, batch_out["y"].shape[0])
    assert sizes[128] == 8 and sizes[512] == 4


def test_prefetcher_workers_preserve_order_and_values():
    """Multi-worker Prefetcher: parallel host assembly, ORDERED delivery,
    identical batches to the single-worker path."""
    import time as _time

    from meant_tpu.data.loader import Prefetcher

    class SlowLoader:
        def __len__(self):
            return 12

        def __iter__(self):
            for i in range(12):
                yield {"i": np.full((4,), i, np.int32)}

    def staged(b):
        _time.sleep(0.02 * (b["i"][0] % 3))  # uneven per-batch latency
        return {"i": b["i"] + 100}

    seq1 = [b["i"][0] for b in Prefetcher(SlowLoader(), staged)]
    seq4 = [b["i"][0] for b in Prefetcher(SlowLoader(), staged, workers=4)]
    assert seq1 == seq4 == [100 + i for i in range(12)]


def test_prefetcher_propagates_staging_errors():
    """A failure during host staging/transfer must surface as the exception
    it is, in BOTH worker modes — a silent early END would truncate the
    epoch and let the trainer score/checkpoint on partial data."""
    import pytest

    from meant_tpu.data.loader import Prefetcher

    class Loader:
        def __len__(self):
            return 6

        def __iter__(self):
            for i in range(6):
                yield {"i": np.full((2,), i, np.int32)}

    def staged(b):
        if b["i"][0] == 3:
            raise ValueError("corrupt chart read")
        return b

    for workers in (1, 4):
        seen = []
        with pytest.raises(ValueError, match="corrupt chart read"):
            for b in Prefetcher(Loader(), staged, workers=workers):
                seen.append(int(b["i"][0]))
        assert seen == [0, 1, 2]  # ordered delivery up to the failure
