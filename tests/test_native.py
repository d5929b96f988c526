"""Native C++ collate kernels vs numpy fallbacks."""

import numpy as np
import pytest

from meant_tpu import native


def test_native_builds():
    assert native.available(), "C++ collate lib failed to build"


def test_tokenize_native_matches_python():
    texts = ["hello world", "", "a b c d e f", "  spaced   out  "]
    ids_n, mask_n = native.fnv1a_tokenize(texts, 8, 1000)
    # force python fallback
    lib, native._LIB, native._TRIED = native._LIB, None, True
    try:
        ids_p, mask_p = native.fnv1a_tokenize(texts, 8, 1000)
    finally:
        native._LIB, native._TRIED = lib, True
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)
    assert ids_n[0, 0] == 2  # BOS
    assert mask_n[1].sum() == 2  # empty text: BOS+EOS only


def test_pad_two_level():
    toks = [[[5, 6, 7], [8]], [[9], [10, 11, 12, 13, 14, 15]]]
    ids, mask = native.pad_two_level(toks, max_len=4)
    assert ids.shape == (2, 2, 4)
    assert list(ids[0, 0]) == [5, 6, 7, 1]
    assert list(ids[1, 1]) == [10, 11, 12, 13]  # truncated
    assert mask[0, 1].sum() == 1


def test_center_pad_images_matches_python():
    rng = np.random.RandomState(0)
    imgs = [rng.rand(3, 5, 7).astype(np.float32),
            rng.rand(3, 10, 4).astype(np.float32)]
    out_n, mask_n = native.center_pad_images(imgs, 12, 12)
    from meant_tpu.data.vqa import center_pad_images as py_impl
    out_p, mask_p = py_impl(imgs, 12, 12)
    np.testing.assert_allclose(out_n, out_p)
    np.testing.assert_allclose(mask_n, mask_p)
