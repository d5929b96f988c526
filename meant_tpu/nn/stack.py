"""Scanned encoder stacks + selective rematerialization policies.

TPU-first rationale (no reference equivalent — the reference unrolls its
`nn.ModuleList` of encoders in python, `src/meant/meant.py:222-248`, which
torch eager never notices): under `jit`, an unrolled depth-N stack traces and
compiles N copies of the same block, so XLA program size — and on this
sandbox the REMOTE compile-service round trip — grows linearly with depth.
The paper's Table-1 meant-LARGE geometry (30+30 encoders, `meant_tex.pdf`)
pays for 60 block copies per program. `scan_layers=True` rolls each tower
into ONE `lax.scan` over layer-stacked params: the block is traced and
compiled once, depth becomes data (the leading axis of every stacked leaf),
and program size is O(1) in depth.

Scan and remat go together: an UNrematerialized scan must stack every
per-layer intermediate for the backward pass and blocks the cross-layer
buffer reuse XLA performs on the unrolled graph — measured on the chip, the
12+12 b16 flagship that fits unrolled OOMs scanned-without-remat (34.9 GiB
vs 15.75 GiB HBM). The models therefore default their scanned towers to the
'dots' policy (MaxText-style always-remat-the-scan-body).

Layer-stacked param layout: the scanned tower lives under a single
`<prefix>_scan` collection whose every leaf carries a leading layer axis.
`stack_encoder_params` / `unstack_encoder_params` convert to/from the
unrolled `<prefix>_{i}` layout, so checkpoints and the torch-weight port
(`utils/port.py`) keep working: port into the unrolled layout, stack once.

Remat spec — the models' `remat=` field (plumbed through `maybe_remat`):

  False           save everything (fastest; most HBM)
  True / "full"   `nn.remat`, nothing saveable: O(sqrt) memory with scan,
                  full forward recompute in the backward
  "dots"          selective policy `jax.checkpoint_policies.dots_saveable`:
                  every matmul OUTPUT is saved (MXU work is never redone),
                  only the cheap elementwise tail (norms, gelu, dropout,
                  residual adds) is recomputed. Caveat, measured not
                  assumed: a `custom_vjp` inside the region — the Pallas
                  flash kernel — re-runs its forward either way, because
                  remat must rebuild the custom VJP's residuals; with
                  flash=True prefer "dots" only when the fit, not the
                  recompute, is the binding constraint.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Type

import jax
from flax import linen as nn


def _remat_kwargs(spec: Any) -> Optional[dict]:
    """None = no remat; otherwise kwargs for nn.remat."""
    if spec in (False, None):
        return None
    if spec in (True, "full"):
        return {}
    if spec == "dots":
        return {"policy": jax.checkpoint_policies.dots_saveable}
    raise ValueError(
        f"unknown remat spec {spec!r}: expected False, True/'full' or 'dots'")


def maybe_remat(enc_cls: Type[nn.Module], spec: Any,
                static_argnums=()) -> Type[nn.Module]:
    """Wrap an encoder class per the remat spec (unrolled-stack path)."""
    kw = _remat_kwargs(spec)
    if kw is None:
        return enc_cls
    return nn.remat(enc_cls, static_argnums=static_argnums, **kw)


def scanned_stack(enc_cls: Type[nn.Module], num_layers: int,
                  enc_kwargs: Dict[str, Any], *, name: str,
                  n_ctx: int = 0, remat: Any = False):
    """Build a depth-`num_layers` scanned tower of `enc_cls` blocks.

    The block's __call__ must be ``(x, *ctx, deterministic) -> x`` with the
    shape of ``x`` invariant across layers (true of Language/VisionEncoder).
    ``ctx`` (e.g. the attention mask) is broadcast to every layer; `n_ctx`
    is how many such args the call site passes. Params live under `name`
    with a leading layer axis on every leaf.

    Returns ``apply(x, *ctx, deterministic)`` for use inside the parent's
    ``@nn.compact`` __call__.
    """

    def apply(x, *ctx_and_det):
        *ctx, deterministic = ctx_and_det
        assert len(ctx) == n_ctx, (len(ctx), n_ctx)

        class _Body(nn.Module):
            # static by construction — lax.scan never sees a traced bool
            deterministic: bool

            @nn.compact
            def __call__(self, carry, *ctx_inner):
                y = enc_cls(**enc_kwargs, name="enc")(
                    carry, *ctx_inner, self.deterministic)
                return y, None

        body = _Body
        kw = _remat_kwargs(remat)
        if kw is not None:
            # prevent_cse=False: inside lax.scan the loop boundary already
            # blocks the CSE that jax.checkpoint guards against
            body = nn.remat(body, prevent_cse=False, **kw)
        scan_cls = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=tuple(nn.broadcast for _ in range(n_ctx)),
            length=num_layers,
        )
        y, _ = scan_cls(deterministic=deterministic, name=name)(x, *ctx)
        return y

    return apply


def stack_encoder_params(params, prefix: str, num_layers: int,
                         scan_name: Optional[str] = None):
    """Unrolled ``{prefix}_{i}`` subtrees -> scanned ``{scan_name}`` layout.

    Operates on the tree that directly holds the encoder subtrees (the
    model's top-level ``params['params']`` for the MEANT models). Returns a
    new plain-dict tree; the input is not mutated.
    """
    import jax.numpy as jnp

    scan_name = scan_name or prefix + "_scan"
    out = dict(params)
    trees = [out.pop(f"{prefix}_{i}") for i in range(num_layers)]
    out[scan_name] = {
        "enc": jax.tree.map(lambda *xs: jnp.stack(xs), *trees)}
    return out


def unstack_encoder_params(params, prefix: str, num_layers: int,
                           scan_name: Optional[str] = None):
    """Inverse of stack_encoder_params (scanned -> unrolled layout)."""
    scan_name = scan_name or prefix + "_scan"
    out = dict(params)
    stacked = out.pop(scan_name)["enc"]
    for i in range(num_layers):
        out[f"{prefix}_{i}"] = jax.tree.map(lambda x, i=i: x[i], stacked)
    return out


# One TimeSformer layer = six flat-named component subtrees (the unrolled
# layout the torch importer produces, `utils/port.import_timesformer`).
TS_COMPONENTS = ("time_norm", "time_attn", "space_norm", "space_attn",
                 "ff_norm", "ff")


def stack_timesformer_params(ts_params, depth: int,
                             scan_name: str = "layers_scan"):
    """Unrolled TimeSformer subtree (``time_attn_{i}``/``ff_{i}``/… flat
    names, nn/timesformer.py) -> the ``layers_scan`` scanned layout. Takes
    and returns the TIMESFORMER subtree (``params['timesformer']`` in the
    meant_timesformer/mosi models)."""
    import jax.numpy as jnp

    out = dict(ts_params)
    enc = {}
    for comp in TS_COMPONENTS:
        trees = [out.pop(f"{comp}_{i}") for i in range(depth)]
        enc[comp] = jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    out[scan_name] = {"enc": enc}
    return out


def unstack_timesformer_params(ts_params, depth: int,
                               scan_name: str = "layers_scan"):
    """Inverse of stack_timesformer_params (scanned -> unrolled layout)."""
    out = dict(ts_params)
    stacked = out.pop(scan_name)["enc"]
    for comp in TS_COMPONENTS:
        for i in range(depth):
            out[f"{comp}_{i}"] = jax.tree.map(lambda x, i=i: x[i],
                                              stacked[comp])
    return out
