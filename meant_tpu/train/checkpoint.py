"""Orbax checkpointing + encoder grafting.

The reference's checkpoint workflows (SURVEY.md §5.4):
  * whole-model pickle per epoch with schema
    `{model}_{num_encoders}_{dataset}_{run_id}_{epoch}.pt`
    (`in_loop_train.py:331`); optimizer/scheduler state saved separately.
  * checkpoint SURGERY: pretrained encoder stacks grafted onto fresh models
    (`model.languageEncoders = …`, `in_loop_train.py:496-507`), embeddings
    swapped into baselines.

TPU equivalents here: orbax pytree checkpoints of {params, opt_state, step},
and `graft` which copies named sub-trees (languageEncoders_*, visionEncoders_*,
embedding, …) from a source params tree into a target — same operation, pure
functional.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional, Sequence

import jax
import orbax.checkpoint as ocp


def checkpoint_name(model_name: str, num_encoders: int, dataset: str,
                    run_id: str, epoch: int) -> str:
    """Reference filename schema (`in_loop_train.py:331`)."""
    return f"{model_name}_{num_encoders}_{dataset}_{run_id}_{epoch}"


_CKPTRS: Dict[str, ocp.StandardCheckpointer] = {}


def _checkpointer(lane: str = "default") -> ocp.StandardCheckpointer:
    """Long-lived per-lane instances: orbax's StandardCheckpointer wraps an
    ASYNC checkpointer whose background write must outlive the call, so
    async saves need a long-lived instance. Lanes exist because
    AsyncCheckpointer.save() BEGINS with wait_until_finished() on its own
    previous save — two back-to-back saves through one instance serialize,
    defeating the async overlap. Saves that should overlap each other (the
    large params write and the small opt-state write) go through different
    lanes."""
    if lane not in _CKPTRS:
        _CKPTRS[lane] = ocp.StandardCheckpointer()
    return _CKPTRS[lane]


def save(path: str, tree, block: bool = True, lane: str = "default") -> None:
    """block=False returns as soon as the device arrays are snapshotted and
    writes to disk in the background (overlaps the next training epoch —
    beyond the reference's synchronous torch.save). Call `wait_for_saves`
    (or the next blocking save/restore) before reading the files.
    Concurrent async saves must use distinct `lane`s — same-lane saves
    serialize against each other (see _checkpointer)."""
    path = os.path.abspath(path)
    ckptr = _checkpointer(lane)
    ckptr.save(path, tree, force=True)
    if block:
        ckptr.wait_until_finished()


def wait_for_saves() -> None:
    """Barrier for outstanding async `save(..., block=False)` writes on
    every lane."""
    for ckptr in _CKPTRS.values():
        ckptr.wait_until_finished()


def restore(path: str, target=None):
    path = os.path.abspath(path)
    wait_for_saves()   # don't read files mid-async-write (any lane)
    ckptr = _checkpointer()
    if target is not None:
        return ckptr.restore(path, target=target)
    return ckptr.restore(path)


def _match_encoder_layout(source_params: Dict, key: str,
                          target_sub) -> Optional[Dict]:
    """Resolve `key`'s subtree from a source that may use the OTHER encoder
    param layout (nn/stack.py): a `<tower>_scan` target grafts from an
    unrolled `<tower>_{i}` source by stacking the TARGET's depth (a deeper
    source contributes its first layers, matching the unrolled→unrolled
    partial-graft semantics), and an unrolled target slices its layer out of
    a scanned source. Returns None when the source has neither layout."""
    from meant_tpu.nn.stack import stack_encoder_params
    if key in source_params:
        return source_params[key]
    if key.endswith("_scan"):
        prefix = key[:-len("_scan")]
        n = int(jax.tree.leaves(target_sub)[0].shape[0])
        if all(f"{prefix}_{i}" in source_params for i in range(n)):
            return stack_encoder_params(source_params, prefix, n)[key]
        return None
    m = re.fullmatch(r"(.*)_(\d+)", key)
    if m and f"{m.group(1)}_scan" in source_params:
        stacked = source_params[f"{m.group(1)}_scan"]["enc"]
        i = int(m.group(2))
        if i < int(jax.tree.leaves(stacked)[0].shape[0]):
            return jax.tree.map(lambda x: x[i], stacked)
    return None


def graft(target_params: Dict, source_params: Dict,
          prefixes: Sequence[str] = ("languageEncoders_", "visionEncoders_",
                                     "embedding")) -> Dict:
    """Copy sub-trees whose top-level key matches any prefix from source into
    target (returns a new tree). Mirrors the reference's encoder grafting
    (`in_loop_train.py:496-507`). Encoder towers graft ACROSS param layouts:
    an unrolled pretraining checkpoint loads into a `scan_layers=True` model
    (subtrees stacked on the fly) and a scanned checkpoint into an unrolled
    model — rather than silently skipping on the key mismatch."""
    out = dict(target_params)
    for key in target_params:
        if not any(key.startswith(p) for p in prefixes):
            continue
        tgt = target_params[key]
        src = _match_encoder_layout(source_params, key, tgt)
        if src is None:
            continue
        # shapes must agree
        jax.tree.map(lambda a, b: None if a.shape == b.shape else
                     (_ for _ in ()).throw(ValueError(
                         f"graft shape mismatch under {key}")), tgt, src)
        out[key] = src
    return out
