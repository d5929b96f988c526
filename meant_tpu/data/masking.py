"""MLM / CLM / MIM masking — numpy, fixed shapes.

Replicates `utils/custom_datasets.py`:
  * mlm (`:41-57`): Bernoulli(p=0.15) over non-special tokens; masked inputs
    replaced by mask_id; labels -100 everywhere EXCEPT masked positions.
    NOTE the reference masks with probability p at every eligible position
    (no 80/10/10 split — plain BERT-minus-the-split), replicated.
  * clm (`:60-87`): labels shifted left, last position -100.
  * mim (`:91-126`): per-PIXEL Bernoulli mask (not per-patch), masked pixels
    set to mask_value; labels -100 on unmasked pixels.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

IGNORE_INDEX = -100


def mask_tokens(input_ids: np.ndarray, mask_token_id: int,
                special_ids: Sequence[int], mlm_probability: float = 0.15,
                seed: int = 0):
    """Returns (masked_inputs, labels)."""
    rng = np.random.RandomState(seed)
    labels = input_ids.copy()
    prob = np.full(labels.shape, mlm_probability)
    special = np.isin(input_ids, np.asarray(list(special_ids)))
    prob[special] = 0.0
    masked = rng.random_sample(labels.shape) < prob
    labels[~masked] = IGNORE_INDEX
    inputs = input_ids.copy()
    inputs[masked] = mask_token_id
    return inputs, labels


def shift_labels_clm(input_ids: np.ndarray):
    labels = input_ids.copy()
    labels[..., :-1] = input_ids[..., 1:]
    labels[..., -1] = IGNORE_INDEX
    return labels


def mask_image(images: np.ndarray, mask_probability: float = 0.15,
               mask_value: float = 0.0, seed: int = 0):
    """Per-pixel Bernoulli masking. Returns (masked, labels) where labels are
    IGNORE_INDEX on unmasked pixels (loss computed on masked ones)."""
    rng = np.random.RandomState(seed)
    labels = images.copy()
    mask = rng.random_sample(images.shape) < mask_probability
    inputs = np.where(mask, mask_value, images)
    labels[~mask] = IGNORE_INDEX
    return inputs.astype(images.dtype), labels
