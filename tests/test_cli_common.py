"""The shared train/val/test split used by every token-classification
harness (in_loop_genia / tweet7 / hug_train).

The reference scores its held-out metric on the SAME slice it early-stops
on (`/root/reference/src/hug/in_loop_genia.py:220-238` uses `val` for both);
`split_train_val_test` instead holds a test slice out of model selection.
These tests pin the slicing contract the harnesses rely on.
"""

import numpy as np

from meant_tpu.cli.common import split_train_val_test


def _data(n):
    return {"x": np.arange(n), "labels": np.arange(n) + 100}


def test_three_way_split_disjoint_and_complete():
    n = 100
    train, val, test = split_train_val_test(_data(n))
    assert len(val["x"]) == 10 and len(test["x"]) == 10
    assert len(train["x"]) == 80
    joined = np.concatenate([val["x"], test["x"], train["x"]])
    np.testing.assert_array_equal(np.sort(joined), np.arange(n))
    # keys sliced consistently (row i of x still pairs with row i of labels)
    np.testing.assert_array_equal(train["labels"], train["x"] + 100)


def test_small_set_val_doubles_as_test():
    # n=2: one val row; too small for a disjoint test slice
    train, val, test = split_train_val_test(_data(2))
    assert len(val["x"]) == 1 and len(train["x"]) == 1
    np.testing.assert_array_equal(test["x"], val["x"])


def test_minimum_viable_three_way():
    # n=3 is the smallest set that yields disjoint val/test
    train, val, test = split_train_val_test(_data(3))
    assert val["x"][0] != test["x"][0]
    assert len(train["x"]) == 1
