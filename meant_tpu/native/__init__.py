"""Native (C++) data-path bindings via ctypes.

Compiles meant_tpu/native/collate.cpp on first use (g++ -O3 -shared) into a
per-repo build dir; every entry point has a numpy fallback so the framework
degrades gracefully where no compiler exists. See collate.cpp for what each
kernel replaces in the reference.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(os.path.dirname(__file__), "collate.cpp")
    build_dir = os.path.join(os.path.dirname(__file__), "_build")
    os.makedirs(build_dir, exist_ok=True)
    # -march=native opt-in via env (portable baseline by default); the
    # flag set participates in the staleness check so changing it rebuilds
    arch = ["-march=native"] if os.environ.get(
        "MEANT_TPU_NATIVE_ARCH", "") == "native" else []
    flags = ["g++", "-O3", *arch, "-shared", "-fPIC", "-std=c++17"]
    import hashlib
    tag = hashlib.md5("-".join(flags).encode()).hexdigest()[:10]
    lib_path = os.path.join(build_dir, f"libcollate-{tag}.so")
    if not os.path.exists(lib_path) or \
            os.path.getmtime(lib_path) < os.path.getmtime(src):
        try:
            subprocess.run([*flags, src, "-o", lib_path],
                           check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            print(f"[meant_tpu.native] build failed, using numpy fallback: "
                  f"{e}")
            return None
    lib = ctypes.CDLL(lib_path)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    lib.fnv1a_tokenize.argtypes = [
        ctypes.c_char_p, i64p, ctypes.c_int, ctypes.c_int, ctypes.c_int64,
        ctypes.c_int32, i32p, f32p]
    lib.pad_two_level.argtypes = [
        i32p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int32, i32p, f32p]
    lib.center_pad_images.argtypes = [
        f32p, i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, f32p]
    _LIB = lib
    return lib


def _fnv1a_py(b: bytes) -> int:
    h = 1469598103934665603
    for c in b:
        h = ((h ^ c) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def fnv1a_tokenize(texts: List[str], max_len: int, vocab: int,
                   pad_id: int = 1):
    """Deterministic whitespace tokenizer: BOS/EOS id 2, hashes into
    [4, vocab). Returns (ids (n, max_len) int32, mask (n, max_len) f32)."""
    n = len(texts)
    lib = _build()
    if lib is not None:
        enc = [t.encode("utf-8", "ignore") for t in texts]
        buf = b"".join(enc)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum([len(e) for e in enc], out=offsets[1:])
        ids = np.empty((n, max_len), np.int32)
        mask = np.empty((n, max_len), np.float32)
        lib.fnv1a_tokenize(buf, offsets, n, max_len, vocab, pad_id, ids,
                           mask)
        return ids, mask
    ids = np.full((n, max_len), pad_id, np.int32)
    mask = np.zeros((n, max_len), np.float32)
    for i, t in enumerate(texts):
        toks = [2] + [4 + _fnv1a_py(w.encode("utf-8", "ignore"))
                      % (vocab - 4)
                      for w in t.split()][: max_len - 2] + [2]
        ids[i, : len(toks)] = toks
        mask[i, : len(toks)] = 1.0
    return ids, mask


def pad_two_level(token_lists: List[List[List[int]]], max_len: int,
                  pad_id: int = 1):
    """token_lists: n samples x lag days x ragged token ids.
    Returns ((n, lag, max_len) int32 ids, float32 mask) — the lag collator
    (`src/utils/custom_datasets.py:238-277`) with a fixed max_len."""
    n = len(token_lists)
    lag = len(token_lists[0])
    lib = _build()
    if lib is not None:
        lengths = np.array([len(day) for s in token_lists for day in s],
                           np.int32)
        flat = np.fromiter((t for s in token_lists for day in s
                            for t in day), np.int32,
                           count=int(lengths.sum()))
        ids = np.empty((n * lag, max_len), np.int32)
        mask = np.empty((n * lag, max_len), np.float32)
        lib.pad_two_level(flat, lengths, n, lag, max_len, pad_id, ids, mask)
        return ids.reshape(n, lag, max_len), mask.reshape(n, lag, max_len)
    ids = np.full((n, lag, max_len), pad_id, np.int32)
    mask = np.zeros((n, lag, max_len), np.float32)
    for i, sample in enumerate(token_lists):
        for d, day in enumerate(sample):
            L = min(len(day), max_len)
            ids[i, d, :L] = day[:L]
            mask[i, d, :L] = 1.0
    return ids, mask


def center_pad_images(images: List[np.ndarray], height: int, width: int):
    """Center-pad (c, h, w) float32 images to (n, c, H, W) + pixel mask."""
    n = len(images)
    c = images[0].shape[0]
    lib = _build()
    if lib is not None:
        dims = np.array([im.shape for im in images], np.int32).reshape(-1)
        flat = np.concatenate([np.ascontiguousarray(im, np.float32).ravel()
                               for im in images])
        out = np.empty((n, c, height, width), np.float32)
        mask = np.empty((n, height, width), np.float32)
        lib.center_pad_images(flat, dims, n, height, width, out, mask)
        return out, mask
    from meant_tpu.data.vqa import center_pad_images as py_impl
    return py_impl(images, height, width)


def available() -> bool:
    return _build() is not None
