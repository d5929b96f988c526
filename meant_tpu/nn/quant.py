"""int8 quantized inference — dynamic activation / per-channel weight quant.

The v5e MXU runs int8 at 2x the bf16 rate (394 TOPS vs 197 TFLOP/s);
measured on this chip at MEANT shapes the quantize-dequantize dot chain
delivers 1.2-1.4x over bf16 on the FF and big projection matmuls
(`scripts/probe_int8.py`). The reference has no quantization story at all;
for TPU serving this is the idiomatic speed/memory lever, so it ships as an
opt-in `Predictor(quantize="int8")` path — training stays bf16/fp32 (the
same probe shows the flagship training step is tiling/roofline-bound where
int8 only returns ~1.05-1.25x, not worth the numerics risk).

Mechanism: a flax method interceptor (`nn.intercept_methods`) swaps every
`nn.Dense.__call__` for

    y = (q_int8(x) @ q_int8(W)) * s_x * s_W + b

with a dynamic per-tensor activation scale and a per-output-channel weight
scale (symmetric, 127-clip). No module rewrites, no param-tree surgery —
any model in the zoo quantizes as-is, and the param checkpoint stays the
fp32 source of truth. XLA folds the quantize ops into the surrounding
fusion; the matmul itself runs int8xint8->int32 on the MXU.
"""

from __future__ import annotations

import contextlib
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

# Dense layers narrower than this skip quantization: the classifier heads
# (features=2) gain nothing and their logits set the output numerics.
MIN_FEATURES = 32


def _amax_scale(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    return s / 127.0 + 1e-12


def _to_int8(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                    -127, 127).astype(jnp.int8)


def int8_dense(x: jnp.ndarray, kernel: jnp.ndarray, bias=None,
               out_dtype=None) -> jnp.ndarray:
    """x: (..., k), kernel: (k, n) -> (..., n) via int8 MXU matmul."""
    sx = _amax_scale(x)                      # per-tensor, dynamic
    sw = _amax_scale(kernel, axis=0)         # per-output-channel, (1, n)
    acc = lax.dot_general(
        _to_int8(x, sx), _to_int8(kernel, sw),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * sw)  # (1,n) broadcasts over rows
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)


def _dense_interceptor(next_fun, args, kwargs, context):
    mod = context.module
    if (type(mod) is nn.Dense and context.method_name == "__call__"
            and mod.features >= MIN_FEATURES):
        (x,) = args
        kernel = mod.param(
            "kernel", mod.kernel_init,
            (jnp.shape(x)[-1], mod.features), mod.param_dtype)
        bias = mod.param("bias", mod.bias_init, (mod.features,),
                         mod.param_dtype) if mod.use_bias else None
        return int8_dense(x, kernel, bias,
                          out_dtype=mod.dtype or jnp.result_type(x))
    return next_fun(*args, **kwargs)


@contextlib.contextmanager
def int8_inference():
    """Context: every nn.Dense >= MIN_FEATURES wide runs int8 inside."""
    with nn.intercept_methods(_dense_interceptor):
        yield


def quantized_apply(model, variables, *args, **kwargs):
    """model.apply with all wide Dense layers in int8 (jit-safe — the
    interceptor only rewrites the traced computation)."""
    with int8_inference():
        return model.apply(variables, *args, **kwargs)
