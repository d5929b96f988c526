"""Optimizers and LR schedules replicating the reference's torch semantics.

Reference wiring (`in_loop_train.py:547-567`):
  * AdamW(lr, weight_decay, betas) — decoupled decay (optax.adamw).
  * Adam(lr, weight_decay, betas) — torch couples decay INTO the gradient
    before the moment updates; replicated with add_decayed_weights ahead of
    adam.
  * Schedules are stepped once per EPOCH (`in_loop_train.py:280`):
      cosine_warm -> CosineAnnealingWarmRestarts(T_0)
      cosine      -> CosineAnnealingLR(T_max)
      linear      -> LinearLR() (start_factor 1/3 over 5 epochs)
  * Gradient clipping: clip_grad_norm_(1.0) every step
    (`in_loop_train.py:236`).

Rotary frequency tables are stored as params (parity with the reference's
requires_grad=False nn.Parameter) — they are masked out of every update here,
matching torch optimizers skipping non-grad params.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import optax


def _trainable_mask(params):
    """False for rotary 'freqs' tables, True elsewhere."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def is_trainable(path):
        return not any(getattr(k, "key", None) == "freqs" for k in path)

    paths = {tuple(p): is_trainable(p) for p, _ in flat}

    def mask_fn(tree):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: paths.get(tuple(p), True), tree)

    return mask_fn(params)


def epoch_schedule(kind: str, base_lr: float, t0: int = 7, tmax: int = 10,
                   steps_per_epoch: int = 1, warmup_steps: int = 0,
                   total_steps: int = 0):
    """Returns an optax schedule over STEPS that reproduces torch's per-epoch
    schedule values (the factor changes only at epoch boundaries).
    `linear_warmup` is the exception: HF get_linear_schedule_with_warmup is
    per-STEP (`src/hug/tweet7.py:444-445`) — 0 -> base over warmup_steps,
    then linearly down to 0 at total_steps."""

    def factor(epoch: float) -> float:
        if kind == "cosine_warm":
            t_cur = epoch % t0
            return (1 + math.cos(math.pi * t_cur / t0)) / 2
        if kind == "cosine":
            return (1 + math.cos(math.pi * epoch / tmax)) / 2
        if kind == "linear":
            # torch LinearLR defaults: start_factor=1/3, total_iters=5
            t = min(epoch, 5)
            return 1.0 / 3 + (1.0 - 1.0 / 3) * (t / 5)
        if kind == "linear_warmup":
            step = epoch * steps_per_epoch
            if warmup_steps and step < warmup_steps:
                return step / warmup_steps
            denom = max(total_steps - warmup_steps, 1)
            return max(0.0, (total_steps - step) / denom)
        if kind == "constant":
            return 1.0
        raise ValueError(f"unsupported scheduler {kind}")

    def schedule(step):
        epoch = jnp.floor_divide(step, steps_per_epoch)
        # jit-safe: compute factor via jnp (re-derive the math inline)
        e = epoch.astype(jnp.float32)
        if kind == "cosine_warm":
            t_cur = jnp.mod(e, t0)
            f = (1 + jnp.cos(jnp.pi * t_cur / t0)) / 2
        elif kind == "cosine":
            f = (1 + jnp.cos(jnp.pi * e / tmax)) / 2
        elif kind == "linear":
            t = jnp.minimum(e, 5.0)
            f = 1.0 / 3 + (2.0 / 3) * (t / 5)
        elif kind == "linear_warmup":
            s = step.astype(jnp.float32)
            wu = jnp.maximum(float(warmup_steps), 1.0)
            denom = float(max(total_steps - warmup_steps, 1))
            f = jnp.where(s < warmup_steps, s / wu,
                          jnp.maximum(0.0, (total_steps - s) / denom))
        elif kind == "constant":
            f = jnp.ones_like(e)
        else:
            raise ValueError(f"unsupported scheduler {kind}")
        return base_lr * f

    schedule.host_factor = factor
    return schedule


def build_optimizer(params, optimizer: str = "AdamW",
                    learning_rate: float = 5e-5, decay: float = 0.0,
                    beta_1: float = 0.9, beta_2: float = 0.999,
                    lr_scheduler: str = "cosine_warm", t0: int = 7,
                    tmax: int = 10, steps_per_epoch: int = 1,
                    warmup_steps: int = 0, total_steps: int = 0,
                    clip_norm: Optional[float] = 1.0,
                    schedule=None,
                    mu_dtype=None) -> optax.GradientTransformation:
    """mu_dtype: storage dtype for the FIRST Adam moment (optax semantics —
    the variance stays fp32). jnp.bfloat16 halves the mu HBM footprint and
    its read/write traffic in the optimizer pass; parity config keeps fp32
    (the torch reference stores fp32 moments)."""
    sched = schedule or epoch_schedule(lr_scheduler, learning_rate, t0, tmax,
                                       steps_per_epoch, warmup_steps,
                                       total_steps)
    mask = _trainable_mask(params)
    if optimizer == "AdamW":
        opt = optax.adamw(sched, b1=beta_1, b2=beta_2, weight_decay=decay,
                          mask=mask if decay else None, mu_dtype=mu_dtype)
    elif optimizer == "Adam":
        chain = []
        if decay:
            chain.append(optax.add_decayed_weights(decay, mask=mask))
        chain.append(optax.adam(sched, b1=beta_1, b2=beta_2,
                                mu_dtype=mu_dtype))
        opt = optax.chain(*chain)
    else:
        raise ValueError("This type of optimizer is not supported.")
    parts = []
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    parts.append(opt)
    # Rotary freq tables receive zero gradient (stop_gradient at use) and are
    # masked out of weight decay above, so their updates are exactly zero —
    # the torch equivalent of requires_grad=False.
    return optax.chain(*parts)
