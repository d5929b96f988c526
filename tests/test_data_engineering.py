"""Offline data-engineering ports: snes labeling, stocknet prep, image prep,
dataprep tokenization, mosi packing."""

import json
import os

import numpy as np
import pandas as pd

from meant_tpu.data_engineering import (dataprep, image_prep, mosi_prep,
                                        snes, stocknet_prep)


def test_snes_movement_labels():
    df = pd.DataFrame({"Date": ["d0", "d1", "d2", "d3"],
                       "Adj Close": [100.0, 101.0, 100.4, 100.2]})
    out = snes.movement_labels(df)
    # d0 -> d1: +1% >= 0.55% -> 1 ; d1 -> d2: -0.59% <= -0.5% -> 0
    assert out["djia_label"][0] == 1
    assert out["djia_label"][1] == 0
    assert pd.isna(out["djia_label"][2])  # -0.2% in dead zone


def test_snes_lag_shifts():
    df = pd.DataFrame({"Date": [f"d{i}" for i in range(8)],
                       "Adj Close": np.linspace(100, 130, 8),
                       "Top1": [f"h{i}" for i in range(8)]})
    df = snes.movement_labels(df)
    out = snes.add_lag_shifts(df)
    assert "Top1_4" in out.columns and "Top1_0" in out.columns
    # day-4 column is the unshifted (target) day
    assert out.iloc[0]["Top1_4"] == df.iloc[4]["Top1"]


def test_stocknet_prep(tmp_path):
    tdir = tmp_path / "AAPL"
    tdir.mkdir()
    with open(tdir / "2020-01-01.json", "w") as f:
        f.write(json.dumps({"text": "apple to the moon"}) + "\n")
        f.write(json.dumps({"text": "selling all my shares"}) + "\n")
        f.write("not json\n")
    df = stocknet_prep.daily_text_frame(str(tdir))
    assert len(df) == 1
    assert "[SEP]" in df.iloc[0]["text"]


def test_image_prep(tmp_path):
    from PIL import Image
    gdir = tmp_path / "graphs"
    tdir = tmp_path / "tweets"
    gdir.mkdir()
    tdir.mkdir()
    Image.new("RGBA", (300, 200), (255, 0, 0, 255)).save(
        gdir / "2020-01-01.png")
    (tdir / "2020-01-01.json").write_text("{}")
    (tdir / "2020-01-02.json").write_text("{}")  # no graph -> skipped
    out = image_prep.prepare_ticker(str(gdir), str(tdir),
                                    str(tmp_path / "AAPL.npy"), size=32)
    assert out.shape == (1, 4, 32, 32)
    assert 0.99 <= out[0, 0].max() <= 1.0  # red channel normalized


def test_dataprep_tokenize(tmp_path):
    tweets = {"2020-01-02": ["second day"],
              "2020-01-01": ["hello world", "more tweets"]}
    ids, mask, dates = dataprep.prepare_ticker(
        tweets, str(tmp_path / "t.npz"), max_len=16)
    assert dates == ["2020-01-01", "2020-01-02"]
    assert ids.shape == (2, 16)
    z = np.load(tmp_path / "t.npz")
    np.testing.assert_array_equal(z["input_ids"], ids)


def test_mosi_packing():
    split = {
        "raw_text": ["hello", "", "world"],
        "text": np.random.rand(3, 50, 768),
        "vision": np.random.rand(3, 50, 20),
        "audio": np.random.rand(3, 50, 130),
        "labels": np.array([[1.2], [-0.5], [-2.0]]),
    }
    clean = mosi_prep.drop_entry(split)
    assert len(clean["raw_text"]) == 2
    arrays = mosi_prep.to_arrays(clean)
    assert arrays["y"].tolist() == [1, 0]
    assert arrays["pixels"].shape == (2, 50, 20)
