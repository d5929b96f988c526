"""Pallas TPU flash-attention kernel with the xPos/rotary rotation fused into
the Q/K load.

Replaces the reference's Dao flash_attn call sites
(`meant/xPosAttention_flash.py:41`, `meant/flash_attention.py:42`).

Design notes (MEANT workloads: s in {128, 196/197, 512}, head dim 96):
  * K and V for one (batch, head) fit comfortably in VMEM at these sequence
    lengths, so the kernel keeps the whole K/V row resident and computes each
    q-block's softmax in ONE pass (no online rescaling needed) — the flash
    property that matters (no (s, s) score matrix in HBM) is preserved, and
    the single-pass softmax is strictly cheaper than the streaming variant.
    A ring/blockwise-K variant can be layered on later for long sequences.
  * The rotary rotation is folded into four precomputed fp32 tables
    (qcos/qsin/kcos/ksin, each (s, d)): xPos q-scale/k-scale are multiplied
    in, pass-through dims get cos=1/sin=0. In-kernel:
        rot(x) = x * cos + rotate_half(x) * sin
    rotate_half (interleaved pairs) is computed with two lane-rolls and a
    parity select — no reshapes, fully vectorized on the VPU.
  * Scores accumulate in fp32 on the MXU (preferred_element_type); softmax in
    fp32; the P @ V matmul accumulates fp32 and casts to the input dtype.
  * Causal masking uses block-row offsets; the additive key padding mask
    follows the reference's (1 - mask) * -1e9 convention
    (`meant/xPosAttention.py:54-56`).

Backward: custom VJP that recomputes attention with plain XLA ops (cheap at
these sequence lengths, keeps grads bit-consistent with the reference math).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meant_tpu.ops.attention import attend

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 512
# K/V stay VMEM-resident below this length (single-pass softmax — strictly
# cheaper); above it the online-softmax k-blocked kernel streams K/V.
K_RESIDENT_LIMIT = 4096


def _rotate_half_lanes(x):
    """Interleaved-pair rotate_half on the last (lane) axis without reshape:
    out[2i] = -x[2i+1]; out[2i+1] = x[2i]."""
    n = x.shape[-1]
    ax = x.ndim - 1
    left = pltpu.roll(x, n - 1, axis=ax)   # out[j] = x[(j+1) % n]
    right = pltpu.roll(x, 1, axis=ax)      # out[j] = x[(j-1) % n]
    parity = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1) % 2
    return jnp.where(parity == 0, -left, right)


def _fwd_kernel(qcos_ref, qsin_ref, kcos_ref, ksin_ref, kmask_ref,
                q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool,
                block_q: int, use_mask: bool):
    j = pl.program_id(1)
    in_dtype = q_ref.dtype
    q = q_ref[0].astype(jnp.float32)            # (block_q, d)
    k = k_ref[0].astype(jnp.float32)            # (s_k, d)
    v = v_ref[0]                                 # (s_k, d)

    # Rotate in fp32, then cast back to the input dtype so the MXU runs
    # bf16 x bf16 -> fp32 (matches the XLA path, where apply_rotary returns
    # t.dtype before the fp32-accumulating einsum).
    q = (q * qcos_ref[:] + _rotate_half_lanes(q) * qsin_ref[:]) \
        .astype(in_dtype)
    k = (k * kcos_ref[:] + _rotate_half_lanes(k) * ksin_ref[:]) \
        .astype(in_dtype)

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # (block_q, s_k)

    s_k = scores.shape[-1]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0) \
            + j * block_q
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col <= row, scores, -jnp.inf)
    if use_mask:
        kmask = kmask_ref[0]                      # (s_k,)
        scores = scores + (1.0 - kmask) * -1e9

    weights = jax.nn.softmax(scores, axis=-1).astype(in_dtype)
    out = jax.lax.dot_general(
        weights, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _fwd_online_kernel(qcos_ref, qsin_ref, kcos_ref, ksin_ref, kmask_ref,
                       q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                       scale: float, causal: bool, block_q: int,
                       block_k: int, use_mask: bool):
    """Online-softmax streaming variant: grid (bh, q_blocks, k_blocks) with
    the k axis innermost (sequential on TPU); running max/denominator/acc in
    VMEM scratch, output written on the last k block."""
    j = pl.program_id(1)
    kk = pl.program_id(2)
    n_k = pl.num_programs(2)
    in_dtype = q_ref.dtype

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    # causal block skipping: a k block whose first column lies beyond the
    # q block's last row contributes nothing — predicate the whole update.
    def body():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        qr = (q * qcos_ref[:] + _rotate_half_lanes(q) * qsin_ref[:]) \
            .astype(in_dtype)
        kr = (k * kcos_ref[:] + _rotate_half_lanes(k) * ksin_ref[:]) \
            .astype(in_dtype)
        scores = jax.lax.dot_general(
            qr, kr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (block_q, block_k)
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0) \
                + j * block_q
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) \
                + kk * block_k
            scores = jnp.where(col <= row, scores, -jnp.inf)
        if use_mask:
            scores = scores + (1.0 - kmask_ref[0]) * -1e9

        m_prev = m_ref[:]                                  # (block_q, 1)
        m_new = jnp.maximum(m_prev,
                            jnp.max(scores, axis=-1, keepdims=True))
        # guard fully-masked rows (all -inf so far)
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(scores - m_safe)
        p = jnp.where(jnp.isfinite(scores), p, 0.0)
        corr = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_safe), 0.0)
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
            p.astype(in_dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    if causal:
        pl.when(kk * block_k <= j * block_q + block_q - 1)(body)
    else:
        body()

    @pl.when(kk == n_k - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)


def _flash_fwd_online(q, k, v, kmask, qcos, qsin, kcos, ksin, *, scale,
                      causal, num_heads, block_q, block_k, interpret):
    bh, s_q, d = q.shape
    s_k = k.shape[1]
    block_q = min(block_q, s_q)
    block_k = min(block_k, s_k)
    use_mask = kmask is not None
    if kmask is None:
        kmask = jnp.ones((1, s_k), jnp.float32)
        kmask_index = lambda i, j, kk: (0, 0)
    else:
        kmask_index = lambda i, j, kk, h=num_heads: (i // h, kk)
    kernel = functools.partial(_fwd_online_kernel, scale=scale,
                               causal=causal, block_q=block_q,
                               block_k=block_k, use_mask=use_mask)
    return pl.pallas_call(
        kernel,
        grid=(bh, pl.cdiv(s_q, block_q), pl.cdiv(s_k, block_k)),
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, j, kk: (j, 0),
                         memory_space=pltpu.VMEM),            # qcos
            pl.BlockSpec((block_q, d), lambda i, j, kk: (j, 0),
                         memory_space=pltpu.VMEM),            # qsin
            pl.BlockSpec((block_k, d), lambda i, j, kk: (kk, 0),
                         memory_space=pltpu.VMEM),            # kcos
            pl.BlockSpec((block_k, d), lambda i, j, kk: (kk, 0),
                         memory_space=pltpu.VMEM),            # ksin
            pl.BlockSpec((1, block_k), kmask_index,
                         memory_space=pltpu.VMEM),            # kmask
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),            # q
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),            # k
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),            # v
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s_q, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),   # acc
            pltpu.VMEM((block_q, 1), jnp.float32),   # running max
            pltpu.VMEM((block_q, 1), jnp.float32),   # running denom
        ],
        interpret=interpret,
    )(qcos, qsin, kcos, ksin, kmask, q, k, v)


def _flash_fwd(q, k, v, kmask, qcos, qsin, kcos, ksin, *, scale, causal,
               num_heads, block_q, interpret):
    """q/k/v: (BH, s, d) with BH = batch * heads; kmask: (batch, s) or None;
    tables: (s, d) fp32."""
    bh, s_q, d = q.shape
    s_k = k.shape[1]
    use_mask = kmask is not None
    block_q = min(block_q, s_q)
    grid = (bh, pl.cdiv(s_q, block_q))
    if kmask is None:
        kmask = jnp.ones((1, s_k), jnp.float32)
        kmask_index = lambda i, j: (0, 0)
    else:
        kmask_index = lambda i, j, h=num_heads: (i // h, 0)

    kernel = functools.partial(_fwd_kernel, scale=scale, causal=causal,
                               block_q=block_q, use_mask=use_mask)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),            # qcos
            pl.BlockSpec((block_q, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),            # qsin
            pl.BlockSpec((s_k, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),            # kcos
            pl.BlockSpec((s_k, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),            # ksin
            pl.BlockSpec((1, s_k), kmask_index,
                         memory_space=pltpu.VMEM),            # kmask
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),            # q
            pl.BlockSpec((1, s_k, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),            # k
            pl.BlockSpec((1, s_k, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),            # v
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s_q, d), q.dtype),
        interpret=interpret,
    )(qcos, qsin, kcos, ksin, kmask, q, k, v)


def _bwd_kernel(qcos_ref, qsin_ref, kcos_ref, ksin_ref, kmask_ref,
                q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale: float, causal: bool, use_mask: bool, block_q: int):
    """Flash backward, q-blocked: grid (bh, q_blocks); recompute this
    q-block's P in VMEM, then
    dV += Pᵀ dO;  dP = dO Vᵀ;  dS = P ∘ (dP - rowsum(P ∘ dP)) * scale;
    dQ = rotᵀ(dS Kr);  dK += rotᵀ(dSᵀ Qr)
    with rotᵀ(g) = cos∘g - H(sin∘g) (H = rotate_half, Hᵀ = -H — the adjoint
    of the linear rotation). dk/dv output blocks are revisited across the
    sequential q-block grid axis and accumulated (zeroed at j == 0)."""
    j = pl.program_id(1)
    in_dtype = q_ref.dtype
    q = q_ref[0].astype(jnp.float32)                    # (block_q, d)
    k = k_ref[0].astype(jnp.float32)                    # (s_k, d)
    v = v_ref[0]
    qc, qs_ = qcos_ref[:], qsin_ref[:]                  # (block_q, d)
    kc, ks_ = kcos_ref[:], ksin_ref[:]                  # (s_k, d)

    qr = (q * qc + _rotate_half_lanes(q) * qs_).astype(in_dtype)
    kr = (k * kc + _rotate_half_lanes(k) * ks_).astype(in_dtype)

    scores = jax.lax.dot_general(
        qr, kr, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale     # (block_q, s_k)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0) \
            + j * block_q
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col <= row, scores, -jnp.inf)
    if use_mask:
        scores = scores + (1.0 - kmask_ref[0]) * -1e9
    p = jax.nn.softmax(scores, axis=-1)                 # fp32

    p_lo = p.astype(in_dtype)
    dv = jax.lax.dot_general(p_lo, do_ref[0],
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do_ref[0], v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = (p * (dp - delta) * scale).astype(in_dtype)    # (block_q, s_k)

    dqr = jax.lax.dot_general(ds, kr, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dkr = jax.lax.dot_general(ds, qr, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dq = qc * dqr - _rotate_half_lanes(qs_ * dqr)
    dk = kc * dkr - _rotate_half_lanes(ks_ * dkr)
    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(j == 0)
    def _():
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)

    @pl.when(j > 0)
    def _():
        dk_ref[0] = dk_ref[0] + dk.astype(dk_ref.dtype)
        dv_ref[0] = dv_ref[0] + dv.astype(dv_ref.dtype)


def _flash_bwd(q, k, v, do, kmask, qcos, qsin, kcos, ksin, *, scale, causal,
               num_heads, block_q, interpret):
    """q/k/v/do: (BH, s, d). q-blocked backward: K/V stay VMEM-resident per
    (batch, head); dk/dv output blocks are revisited and accumulated across
    the (sequential) q-block axis in fp32."""
    bh, s_q, d = q.shape
    s_k = k.shape[1]
    block_q = min(block_q, s_q)
    use_mask = kmask is not None
    if kmask is None:
        kmask = jnp.ones((1, s_k), jnp.float32)
        kmask_index = lambda i, j: (0, 0)
    else:
        kmask_index = lambda i, j, h=num_heads: (i // h, 0)
    kernel = functools.partial(_bwd_kernel, scale=scale, causal=causal,
                               use_mask=use_mask, block_q=block_q)
    qtab = lambda: pl.BlockSpec((block_q, d), lambda i, j: (j, 0),
                                memory_space=pltpu.VMEM)
    ktab = lambda: pl.BlockSpec((s_k, d), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)
    per_q = lambda: pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
    per_k = lambda: pl.BlockSpec((1, s_k, d), lambda i, j: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh, pl.cdiv(s_q, block_q)),
        in_specs=[
            qtab(), qtab(),            # qcos, qsin
            ktab(), ktab(),            # kcos, ksin
            pl.BlockSpec((1, s_k), kmask_index, memory_space=pltpu.VMEM),
            per_q(), per_k(), per_k(), per_q(),
        ],
        out_specs=(per_q(), per_k(), per_k()),
        out_shape=(jax.ShapeDtypeStruct((bh, s_q, d), q.dtype),
                   jax.ShapeDtypeStruct((bh, s_k, d), jnp.float32),
                   jax.ShapeDtypeStruct((bh, s_k, d), jnp.float32)),
        interpret=interpret,
    )(qcos, qsin, kcos, ksin, kmask, q, k, v, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def _xla_reference(q, k, v, kmask, qcos, qsin, kcos, ksin, *, scale, causal,
                   num_heads):
    """Identical math in plain XLA (used for the VJP and as CPU fallback).
    q/k/v: (b, h, s, d)."""
    from meant_tpu.ops.rotary import rotate_half

    def rot(t, cos, sin):
        tf = t.astype(jnp.float32)
        return tf * cos + rotate_half(tf) * sin

    qr = rot(q, qcos, qsin).astype(q.dtype)
    kr = rot(k, kcos, ksin).astype(k.dtype)
    return attend(qr, kr, v, scale=scale, causal=causal,
                  attention_mask=kmask)


@functools.lru_cache(maxsize=64)
def _make_flash(scale: float, causal: bool, num_heads: int, block_q: int,
                interpret: bool, online: bool = False,
                block_k: int = DEFAULT_BLOCK_K):
    @jax.custom_vjp
    def f(q, k, v, kmask, qcos, qsin, kcos, ksin):
        b, h, s_q, d = q.shape
        fwd_fn = (functools.partial(_flash_fwd_online, block_k=block_k)
                  if online else _flash_fwd)
        out = fwd_fn(q.reshape(b * h, s_q, d),
                     k.reshape(b * h, k.shape[2], d),
                     v.reshape(b * h, v.shape[2], d),
                     kmask, qcos, qsin, kcos, ksin, scale=scale,
                     causal=causal, num_heads=num_heads, block_q=block_q,
                     interpret=interpret)
        return out.reshape(b, h, s_q, d)

    def fwd(q, k, v, kmask, qcos, qsin, kcos, ksin):
        return f(q, k, v, kmask, qcos, qsin, kcos, ksin), \
            (q, k, v, kmask, qcos, qsin, kcos, ksin)

    def bwd(res, g):
        q, k, v, kmask, qcos, qsin, kcos, ksin = res
        b, h, s_q, d = q.shape
        s_k = k.shape[2]
        dq, dk, dv = _flash_bwd(
            q.reshape(b * h, s_q, d), k.reshape(b * h, s_k, d),
            v.reshape(b * h, s_k, d), g.reshape(b * h, s_q, d),
            kmask, qcos, qsin, kcos, ksin, scale=scale, causal=causal,
            num_heads=num_heads, block_q=block_q, interpret=interpret)
        zeros = lambda t: None if t is None else jnp.zeros_like(t)
        return (dq.reshape(b, h, s_q, d), dk.reshape(b, h, s_k, d),
                dv.reshape(b, h, s_k, d), zeros(kmask),
                jnp.zeros_like(qcos), jnp.zeros_like(qsin),
                jnp.zeros_like(kcos), jnp.zeros_like(ksin))

    f.defvjp(fwd, bwd)
    return f


def flash_mha(q, k, v, *, scale: float, causal: bool = False,
              attention_mask: Optional[jnp.ndarray] = None,
              qcos=None, qsin=None, kcos=None, ksin=None,
              block_q: int = DEFAULT_BLOCK_Q,
              block_k: int = DEFAULT_BLOCK_K,
              force_online: Optional[bool] = None,
              interpret: Optional[bool] = None):
    """Fused rotary + attention. q/k/v: (b, h, s, d). The four tables are
    (s, d) fp32 (identity rotation when None). K/V stream blockwise with an
    online softmax when s_k > K_RESIDENT_LIMIT (or force_online=True)."""
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    if qcos is None:
        qcos = jnp.ones((s_q, d), jnp.float32)
        qsin = jnp.zeros((s_q, d), jnp.float32)
    if kcos is None:
        kcos = jnp.ones((s_k, d), jnp.float32)
        ksin = jnp.zeros((s_k, d), jnp.float32)
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu",)
    kmask = None
    if attention_mask is not None:
        kmask = attention_mask.astype(jnp.float32)
    online = (force_online if force_online is not None
              else s_k > K_RESIDENT_LIMIT)
    fn = _make_flash(float(scale), bool(causal), h, int(block_q),
                     bool(interpret), online=bool(online),
                     block_k=int(block_k))
    return fn(q, k, v, kmask, qcos, qsin, kcos, ksin)
