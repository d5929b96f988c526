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
    Beyond K_RESIDENT_LIMIT an online-softmax streaming variant takes over
    (fwd + bwd); the ring variant over a device mesh lives in ops/ring.py.
  * q blocks are auto-sized so the (block_q, s_k) fp32 score block fits a
    ~4 MB VMEM budget — whole-q at s<=2048 (1.6x faster than 128-row blocks
    at s=512, measured on v5e).
  * flash_mha zero-pads sequence axes to block multiples OUTSIDE the
    kernels and slices the result (undefined out-of-bounds block reads
    otherwise poison accumulators via 0*garbage, and TPU lowering requires
    divisible block shapes); the in-kernel bounds masks remain as defense
    for direct _flash_* callers.
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

Backward: custom VJP with two regimes. Short sequences (K/V VMEM-resident)
use a q-blocked Pallas backward that recomputes each q-block's softmax in
one pass. Long sequences (online path) use a streaming FlashAttention-2
style backward: the forward saves per-row logsumexp, delta = rowsum(dO*O)
is computed in XLA, and two kernels stream blocks — dQ over k blocks,
dK/dV over q blocks — with fp32 scratch accumulators and causal block
skipping, so VMEM stays O(block^2) at any sequence length.
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
DEFAULT_BLOCK_K = 1024   # streaming grad at s=8192: bk=1024 beats 512 by ~20%
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


def _zero_rows_beyond(x, block_start, limit):
    """Zero rows of a (rows, d) block whose GLOBAL row index >= limit.

    Defense for direct callers of the streaming kernels at non-block-
    divisible sequence lengths (flash_mha always block-pads outside, so on
    the public path these branches are compile-time dead): out-of-bounds
    Pallas block reads have undefined content, and masking derived weights
    alone is insufficient — `0 * NaN = NaN` escapes through every
    contraction that touches the padded rows as CONTENT (p @ v, ds @ kr,
    ds^T @ qr, p^T @ do). Zeroing the loaded block rows kills the garbage
    at the source."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + block_start
    return jnp.where(row < limit, x, 0)


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
                       q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref,
                       l_ref, *, scale: float, causal: bool, block_q: int,
                       block_k: int, use_mask: bool, seq_k: int):
    """Online-softmax streaming variant: grid (bh, q_blocks, k_blocks) with
    the k axis innermost (sequential on TPU); running max/denominator/acc in
    VMEM scratch, output + per-row logsumexp written on the last k block.
    The LSE output feeds the streaming backward (softmax is reconstructed
    per block as exp(scores - lse) without a second online pass)."""
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
        if seq_k % block_k != 0:
            # block-padded key columns (content undefined) must not leak
            # into the softmax denominator
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) \
                + kk * block_k
            scores = jnp.where(col < seq_k, scores, -jnp.inf)
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
        v = v_ref[0]
        if seq_k % block_k != 0:
            # p = 0 on padded columns is not enough: 0 * undefined-V = NaN
            # inside the dot — zero the padded V rows themselves
            v = _zero_rows_beyond(v, kk * block_k, seq_k)
        acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
            p.astype(in_dtype), v, (((1,), (0,)), ((), ())),
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
        # lse = m + log(l): softmax row i of the full scores is
        # exp(scores_i - lse_i). Fully-masked rows (m = -inf, l = 0) get a
        # large-negative finite lse so exp(scores - lse) stays 0 in the bwd.
        m_safe = jnp.where(jnp.isfinite(m_ref[:]), m_ref[:], 0.0)
        lse_ref[0] = m_safe + jnp.log(denom)          # (block_q, 1)


def _flash_fwd_online(q, k, v, kmask, qcos, qsin, kcos, ksin, *, scale,
                      causal, num_heads, block_q, block_k, interpret):
    """Returns (out (bh, s_q, d), lse (bh, s_q, 1) fp32)."""
    bh, s_q, d = q.shape
    s_k = k.shape[1]
    block_q = min(block_q, s_q)
    block_k = min(block_k, s_k)
    use_mask = kmask is not None
    # 3-D (b_mask, 1, s_k) mask — see _flash_fwd for the lowering rationale
    if kmask is None:
        kmask = jnp.ones((1, 1, s_k), jnp.float32)
        kmask_index = lambda i, j, kk: (0, 0, 0)
    else:
        kmask = kmask.reshape(kmask.shape[0], 1, s_k)
        if kmask.shape[0] == 1:
            kmask_index = lambda i, j, kk: (0, 0, kk)
        else:
            kmask_index = lambda i, j, kk, h=num_heads: (i // h, 0, kk)
    kernel = functools.partial(_fwd_online_kernel, scale=scale,
                               causal=causal, block_q=block_q,
                               block_k=block_k, use_mask=use_mask,
                               seq_k=s_k)
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
            pl.BlockSpec((1, 1, block_k), kmask_index,
                         memory_space=pltpu.VMEM),            # kmask
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),            # q
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),            # k
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),            # v
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((bh, s_q, d), q.dtype),
                   jax.ShapeDtypeStruct((bh, s_q, 1), jnp.float32)),
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
    # kmask is carried 3-D (b_mask, 1, s_k) so its block shape (1, 1, s_k)
    # satisfies the TPU lowering rule on the last two dims (dim -2 == array
    # dim); a 2-D (1, s_k) block on a (b, s_k) array fails for b > 1.
    if kmask is None:
        kmask = jnp.ones((1, 1, s_k), jnp.float32)
        kmask_index = lambda i, j: (0, 0, 0)
    else:
        kmask = kmask.reshape(kmask.shape[0], 1, s_k)
        if kmask.shape[0] == 1:  # broadcast mask (e.g. pure padding mask)
            kmask_index = lambda i, j: (0, 0, 0)
        else:
            kmask_index = lambda i, j, h=num_heads: (i // h, 0, 0)

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
            pl.BlockSpec((1, 1, s_k), kmask_index,
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
                scale: float, causal: bool, use_mask: bool, block_q: int,
                seq_q: int):
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
    do = do_ref[0]
    if seq_q % block_q != 0:
        # direct-caller defense (flash_mha always block-pads; K/V here are
        # loaded at exact size so only the q axis can carry undefined
        # padded rows): a NaN row of p would contaminate EVERY dv row
        # through the p^T @ do contraction. With qr/do zeroed, the padded
        # rows flow through as p = uniform · do = 0 => zero contribution
        # to dv/dk, and their dq rows land in discarded output rows.
        qr = _zero_rows_beyond(qr, j * block_q, seq_q)
        do = _zero_rows_beyond(do, j * block_q, seq_q)

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
    dv = jax.lax.dot_general(p_lo, do,
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
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
    # 3-D (b_mask, 1, s_k) mask — see _flash_fwd for the lowering rationale
    if kmask is None:
        kmask = jnp.ones((1, 1, s_k), jnp.float32)
        kmask_index = lambda i, j: (0, 0, 0)
    else:
        kmask = kmask.reshape(kmask.shape[0], 1, s_k)
        if kmask.shape[0] == 1:
            kmask_index = lambda i, j: (0, 0, 0)
        else:
            kmask_index = lambda i, j, h=num_heads: (i // h, 0, 0)
    kernel = functools.partial(_bwd_kernel, scale=scale, causal=causal,
                               use_mask=use_mask, block_q=block_q,
                               seq_q=s_q)
    qtab = lambda: pl.BlockSpec((block_q, d), lambda i, j: (j, 0),
                                memory_space=pltpu.VMEM)
    ktab = lambda: pl.BlockSpec((s_k, d), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)
    per_q = lambda: pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
    per_k = lambda: pl.BlockSpec((1, s_k, d), lambda i, j: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    # NOTE: dk/dv correctness relies on the q-block grid axis executing
    # SEQUENTIALLY per (batch, head) — output blocks are revisited and
    # accumulated across j. TPU Pallas guarantees sequential grid execution
    # within a core (grids are loops, not parallel launches), which is what
    # makes the revisit-accumulate pattern sound; the streaming backward
    # below instead accumulates in VMEM scratch and never revisits.
    n_qblocks = pl.cdiv(s_q, block_q)
    # dk/dv accumulate across q blocks IN the output ref, so multi-block
    # grids need fp32 outputs (bf16 += would lose low bits each revisit) and
    # pay an out-of-kernel convert back to the input dtype. The auto whole-q
    # regime (block_q == s_q, the flagship's s=512 path) has exactly one
    # write — emit the input dtype directly and skip the fp32 HBM round-trip
    # (~126 MB/array/layer at flagship geometry). In-block math stays fp32
    # via preferred_element_type either way.
    acc_dtype = k.dtype if n_qblocks == 1 else jnp.float32
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh, n_qblocks),
        in_specs=[
            qtab(), qtab(),            # qcos, qsin
            ktab(), ktab(),            # kcos, ksin
            pl.BlockSpec((1, 1, s_k), kmask_index, memory_space=pltpu.VMEM),
            per_q(), per_k(), per_k(), per_q(),
        ],
        out_specs=(per_q(), per_k(), per_k()),
        out_shape=(jax.ShapeDtypeStruct((bh, s_q, d), q.dtype),
                   jax.ShapeDtypeStruct((bh, s_k, d), acc_dtype),
                   jax.ShapeDtypeStruct((bh, s_k, d), acc_dtype)),
        interpret=interpret,
    )(qcos, qsin, kcos, ksin, kmask, q, k, v, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def _bwd_dq_kernel(qcos_ref, qsin_ref, kcos_ref, ksin_ref, kmask_ref,
                   q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, acc_ref, *, scale: float, causal: bool,
                   use_mask: bool, block_q: int, block_k: int, seq_k: int):
    """Streaming dQ: grid (bh, q_blocks, k_blocks), k innermost (sequential).
    Softmax is reconstructed per (q, k) block from the forward LSE
    (p = exp(scores - lse)); dQr accumulates in fp32 scratch and the rotation
    adjoint is applied once on the last k block. VMEM footprint is
    O(block_q * block_k + block * d) — independent of s_k."""
    j = pl.program_id(1)
    kk = pl.program_id(2)
    n_k = pl.num_programs(2)
    in_dtype = q_ref.dtype

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def body():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        qr = (q * qcos_ref[:] + _rotate_half_lanes(q) * qsin_ref[:]) \
            .astype(in_dtype)
        kr = (k * kcos_ref[:] + _rotate_half_lanes(k) * ksin_ref[:]) \
            .astype(in_dtype)
        v = v_ref[0]
        if seq_k % block_k != 0:
            # contain undefined K/V content at the source: padded kr rows
            # would reach REAL dq rows via 0 * NaN in the ds @ kr
            # contraction, and padded V rows poison dp the same way
            kr = _zero_rows_beyond(kr, kk * block_k, seq_k)
            v = _zero_rows_beyond(v, kk * block_k, seq_k)
        scores = jax.lax.dot_general(
            qr, kr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0) \
                + j * block_q
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) \
                + kk * block_k
            scores = jnp.where(col <= row, scores, -jnp.inf)
        if seq_k % block_k != 0:
            # padded key columns must not enter the softmax reconstruction
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) \
                + kk * block_k
            scores = jnp.where(col < seq_k, scores, -jnp.inf)
        if use_mask:
            scores = scores + (1.0 - kmask_ref[0]) * -1e9
        p = jnp.exp(scores - lse_ref[0])               # (block_q, block_k)
        dp = jax.lax.dot_general(do_ref[0], v,
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # padded columns: p = 0, dp = 0 (V zeroed) => ds = 0 exactly
        ds = (p * (dp - delta_ref[0]) * scale).astype(in_dtype)
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            ds, kr, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if causal:
        # k blocks entirely above the diagonal contribute nothing
        pl.when(kk * block_k <= j * block_q + block_q - 1)(body)
    else:
        body()

    @pl.when(kk == n_k - 1)
    def _():
        dqr = acc_ref[:]
        dq = qcos_ref[:] * dqr - _rotate_half_lanes(qsin_ref[:] * dqr)
        dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkdv_kernel(qcos_ref, qsin_ref, kcos_ref, ksin_ref, kmask_ref,
                     q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                     dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float,
                     causal: bool, use_mask: bool, block_q: int,
                     block_k: int, seq_q: int, seq_k: int):
    """Streaming dK/dV: grid (bh, k_blocks, q_blocks), q innermost
    (sequential). dKr/dV accumulate in fp32 scratch; k-rotation adjoint is
    applied once on the last q block. No output-block revisiting."""
    kk = pl.program_id(1)
    j = pl.program_id(2)
    n_q = pl.num_programs(2)
    in_dtype = q_ref.dtype

    @pl.when(j == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    def body():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        qr = (q * qcos_ref[:] + _rotate_half_lanes(q) * qsin_ref[:]) \
            .astype(in_dtype)
        kr = (k * kcos_ref[:] + _rotate_half_lanes(k) * ksin_ref[:]) \
            .astype(in_dtype)
        scores = jax.lax.dot_general(
            qr, kr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0) \
                + j * block_q
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) \
                + kk * block_k
            scores = jnp.where(col <= row, scores, -jnp.inf)
        if use_mask:
            scores = scores + (1.0 - kmask_ref[0]) * -1e9
        if seq_k % block_k != 0:
            # defense for direct callers (flash_mha always block-pads):
            # block-padded k columns hold undefined K/V — mask them so the
            # garbage never reaches p/dp even though the padded dK/dV rows
            # are discarded by the caller anyway
            colk = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) \
                + kk * block_k
            scores = jnp.where(colk < seq_k, scores, -jnp.inf)
        p = jnp.exp(scores - lse_ref[0])               # (block_q, block_k)
        do = do_ref[0]
        delta = delta_ref[0]
        if seq_q % block_q != 0:
            # block-padded q rows carry undefined lse/do/delta/q. Zeroing
            # the derived p alone is insufficient — the undefined CONTENT
            # still reaches real dK/dV rows through 0 * NaN in the
            # p^T @ do and ds^T @ qr contractions; zero it at the source.
            row = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0) \
                + j * block_q
            p = jnp.where(row < seq_q, p, 0.0)
            do = _zero_rows_beyond(do, j * block_q, seq_q)
            delta = _zero_rows_beyond(delta, j * block_q, seq_q)
            qr = _zero_rows_beyond(qr, j * block_q, seq_q)
        p_lo = p.astype(in_dtype)
        dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
            p_lo, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v_ref[0],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # padded q rows: p = 0, dp = 0 (do zeroed), delta = 0 => ds = 0
        # exactly, so nothing undefined reaches the dk accumulation
        ds = (p * (dp - delta) * scale).astype(in_dtype)
        dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
            ds, qr, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if causal:
        # q blocks entirely above the k block's first column see only
        # masked entries — skip them.
        pl.when(j * block_q + block_q - 1 >= kk * block_k)(body)
    else:
        body()

    @pl.when(j == n_q - 1)
    def _():
        dkr = dk_acc[:]
        dk = kcos_ref[:] * dkr - _rotate_half_lanes(ksin_ref[:] * dkr)
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_online(q, k, v, do, lse, delta, kmask, qcos, qsin, kcos,
                      ksin, *, scale, causal, num_heads, block_q, block_k,
                      interpret):
    """Streaming (k-blocked) flash backward. q/k/v/do: (BH, s, d);
    lse/delta: (BH, s_q, 1) fp32 from the forward. Two kernels: dQ streams
    k blocks, dK/dV streams q blocks; both hold O(block^2) in VMEM so
    sequences far beyond the K-resident limit backprop without spilling."""
    bh, s_q, d = q.shape
    s_k = k.shape[1]
    block_q = min(block_q, s_q)
    block_k = min(block_k, s_k)
    use_mask = kmask is not None
    # 3-D (b_mask, 1, s_k) mask — see _flash_fwd for the lowering rationale
    if kmask is None:
        kmask = jnp.ones((1, 1, s_k), jnp.float32)
        kmask_dq = lambda i, j, kk: (0, 0, 0)
        kmask_dkv = lambda i, kk, j: (0, 0, 0)
    else:
        kmask = kmask.reshape(kmask.shape[0], 1, s_k)
        if kmask.shape[0] == 1:
            kmask_dq = lambda i, j, kk: (0, 0, kk)
            kmask_dkv = lambda i, kk, j: (0, 0, kk)
        else:
            kmask_dq = lambda i, j, kk, h=num_heads: (i // h, 0, kk)
            kmask_dkv = lambda i, kk, j, h=num_heads: (i // h, 0, kk)

    vm = pltpu.VMEM
    common = dict(scale=scale, causal=causal, use_mask=use_mask,
                  block_q=block_q, block_k=block_k)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, seq_k=s_k, **common),
        grid=(bh, pl.cdiv(s_q, block_q), pl.cdiv(s_k, block_k)),
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, j, kk: (j, 0),
                         memory_space=vm),                     # qcos
            pl.BlockSpec((block_q, d), lambda i, j, kk: (j, 0),
                         memory_space=vm),                     # qsin
            pl.BlockSpec((block_k, d), lambda i, j, kk: (kk, 0),
                         memory_space=vm),                     # kcos
            pl.BlockSpec((block_k, d), lambda i, j, kk: (kk, 0),
                         memory_space=vm),                     # ksin
            pl.BlockSpec((1, 1, block_k), kmask_dq, memory_space=vm),
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0),
                         memory_space=vm),                     # q
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0),
                         memory_space=vm),                     # k
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0),
                         memory_space=vm),                     # v
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0),
                         memory_space=vm),                     # do
            pl.BlockSpec((1, block_q, 1), lambda i, j, kk: (i, j, 0),
                         memory_space=vm),                     # lse
            pl.BlockSpec((1, block_q, 1), lambda i, j, kk: (i, j, 0),
                         memory_space=vm),                     # delta
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((bh, s_q, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(qcos, qsin, kcos, ksin, kmask, q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkdv_kernel, seq_q=s_q, seq_k=s_k, **common),
        grid=(bh, pl.cdiv(s_k, block_k), pl.cdiv(s_q, block_q)),
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, kk, j: (j, 0),
                         memory_space=vm),                     # qcos
            pl.BlockSpec((block_q, d), lambda i, kk, j: (j, 0),
                         memory_space=vm),                     # qsin
            pl.BlockSpec((block_k, d), lambda i, kk, j: (kk, 0),
                         memory_space=vm),                     # kcos
            pl.BlockSpec((block_k, d), lambda i, kk, j: (kk, 0),
                         memory_space=vm),                     # ksin
            pl.BlockSpec((1, 1, block_k), kmask_dkv, memory_space=vm),
            pl.BlockSpec((1, block_q, d), lambda i, kk, j: (i, j, 0),
                         memory_space=vm),                     # q
            pl.BlockSpec((1, block_k, d), lambda i, kk, j: (i, kk, 0),
                         memory_space=vm),                     # k
            pl.BlockSpec((1, block_k, d), lambda i, kk, j: (i, kk, 0),
                         memory_space=vm),                     # v
            pl.BlockSpec((1, block_q, d), lambda i, kk, j: (i, j, 0),
                         memory_space=vm),                     # do
            pl.BlockSpec((1, block_q, 1), lambda i, kk, j: (i, j, 0),
                         memory_space=vm),                     # lse
            pl.BlockSpec((1, block_q, 1), lambda i, kk, j: (i, j, 0),
                         memory_space=vm),                     # delta
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda i, kk, j: (i, kk, 0),
                         memory_space=vm),
            pl.BlockSpec((1, block_k, d), lambda i, kk, j: (i, kk, 0),
                         memory_space=vm),
        ),
        out_shape=(jax.ShapeDtypeStruct((bh, s_k, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, s_k, d), v.dtype)),
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        interpret=interpret,
    )(qcos, qsin, kcos, ksin, kmask, q, k, v, do, lse, delta)
    return dq, dk, dv


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


def _spmd_wrap(impl, rule: str):
    """Wrap `impl` with SPMD partitioning rules so jit/pjit can shard the
    pallas custom call over the BATCH and HEAD axes instead of gathering
    and replicating it (which is what the partitioner does with an opaque
    custom call — measured: a batch-sharded `jit(grad(flash_attention))`
    over an 8-device mesh came back fully replicated).

    `rule` is the Shardy einsum-like mapping, e.g.
    'b h q e, b h k e, ... -> b h q e'. Factors `b` (batch) and `h`
    (heads) shard through; every OTHER factor is declared
    need-replication — the kernel needs whole sequence rows (sequence
    sharding is ring attention's job, ops/ring.py). Kernels derive the
    head count from the LOCAL shapes, so head (megatron TP) sharding
    works too. The same mapping drives both the Shardy rule and the
    legacy partition callbacks (older GSPMD path)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    fn = custom_partitioning(impl)
    in_maps, out_maps = (
        [m.split() for m in side.split(",")]
        for side in rule.split("->"))
    order = []   # factors by first appearance (Shardy wants special
    for m in in_maps + out_maps:       # factors sorted by factor index)
        for f in m:
            if f not in order:
                order.append(f)
    replicated = tuple(f for f in order if f not in ("b", "h"))

    def _shardings(mesh, arg_shapes, result_shape):
        spec = ()
        sh = getattr(arg_shapes[0], "sharding", None)
        if sh is not None and hasattr(sh, "spec"):
            spec = tuple(sh.spec)
        b_ax = spec[0] if len(spec) > 0 else None
        h_ax = spec[1] if len(spec) > 1 else None
        axis = {"b": b_ax, "h": h_ax}

        def mk(mapping):
            return NamedSharding(
                mesh, P(*(axis.get(f) for f in mapping)))

        args = tuple(mk(m) for m in in_maps)
        flat, tree = jax.tree.flatten(result_shape)
        outs = jax.tree.unflatten(tree, [mk(m) for m in out_maps[:len(flat)]])
        return args, outs

    def partition(mesh, arg_shapes, result_shape):
        args, outs = _shardings(mesh, arg_shapes, result_shape)
        return mesh, impl, outs, args

    def infer(mesh, arg_shapes, result_shape):
        return _shardings(mesh, arg_shapes, result_shape)[1]

    fn.def_partition(partition=partition,
                     infer_sharding_from_operands=infer,
                     sharding_rule=rule,
                     need_replication_factors=replicated)
    return fn


@functools.lru_cache(maxsize=64)
def _make_flash(scale: float, causal: bool, num_heads: int, block_q: int,
                interpret: bool, online: bool = False,
                block_k: int = DEFAULT_BLOCK_K, with_lse: bool = False,
                spmd: bool = True):
    """with_lse=True (requires online=True) returns (out, lse (b,h,s_q,1))
    with a JOINT custom VJP: the lse cotangent folds into the backward's
    delta input (d lse_i/d score_ij = p_ij, so ds = p*(dp - (delta - g_lse))
    — one subtraction, same kernels). This is the chunk primitive for ring
    attention (ops/ring.py): per-chunk outputs combine across the ring with
    an online-softmax merge in XLA, and grads flow through both out and lse.

    spmd=True teaches the partitioner to shard the kernel over batch/head
    mesh axes (`_spmd_wrap`); pass False when already inside a shard_map
    (the ring path)."""
    assert not (with_lse and not online), "with_lse requires the online path"

    def fwd_impl(q, k, v, kmask, qcos, qsin, kcos, ksin):
        """(b,h,s,d) in; returns (out, lse (b,h,s_q,1)) online, out else.
        num_heads comes from the LOCAL shape (SPMD shards may carry fewer
        heads than the global call)."""
        b, h, s_q, d = q.shape
        common = dict(scale=scale, causal=causal, num_heads=h,
                      block_q=block_q, interpret=interpret)
        qf = q.reshape(b * h, s_q, d)
        kf = k.reshape(b * h, k.shape[2], d)
        vf = v.reshape(b * h, v.shape[2], d)
        if online:
            out, lse = _flash_fwd_online(qf, kf, vf, kmask, qcos, qsin,
                                         kcos, ksin, block_k=block_k,
                                         **common)
            return out.reshape(b, h, s_q, d), lse.reshape(b, h, s_q)
        out = _flash_fwd(qf, kf, vf, kmask, qcos, qsin, kcos, ksin,
                         **common)
        return out.reshape(b, h, s_q, d)

    def bwd_online_impl(q, k, v, kmask, qcos, qsin, kcos, ksin, out, lse,
                        g, g_lse):
        """(b,h,s,d)-shaped residuals/cotangents in (lse/g_lse (b,h,s));
        (dq, dk, dv) out."""
        b, h, s_q, d = q.shape
        s_k = k.shape[2]
        # delta = rowsum(dO * O) — cheap elementwise+reduce in XLA; the
        # lse cotangent folds straight into it.
        delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                        axis=-1).reshape(b * h, s_q, 1)
        delta = delta - g_lse.astype(jnp.float32).reshape(b * h, s_q, 1)
        dq, dk, dv = _flash_bwd_online(
            q.reshape(b * h, s_q, d), k.reshape(b * h, s_k, d),
            v.reshape(b * h, s_k, d), g.reshape(b * h, s_q, d),
            lse.reshape(b * h, s_q, 1), delta, kmask, qcos, qsin, kcos,
            ksin, scale=scale, causal=causal, num_heads=h, block_q=block_q,
            block_k=block_k, interpret=interpret)
        return (dq.reshape(b, h, s_q, d), dk.reshape(b, h, s_k, d),
                dv.reshape(b, h, s_k, d))

    def bwd_resident_impl(q, k, v, kmask, qcos, qsin, kcos, ksin, g):
        """Resident-path backward: recomputes softmax in-kernel, so no
        out/lse/delta residuals cross the call boundary."""
        b, h, s_q, d = q.shape
        s_k = k.shape[2]
        dq, dk, dv = _flash_bwd(
            q.reshape(b * h, s_q, d), k.reshape(b * h, s_k, d),
            v.reshape(b * h, s_k, d), g.reshape(b * h, s_q, d), kmask,
            qcos, qsin, kcos, ksin, scale=scale, causal=causal,
            num_heads=h, block_q=block_q, interpret=interpret)
        return (dq.reshape(b, h, s_q, d), dk.reshape(b, h, s_k, d),
                dv.reshape(b, h, s_k, d))

    bwd_impl = bwd_online_impl if online else bwd_resident_impl
    QKV = "b h q e, b h k e, b h k e"
    TABLES = "q e, q e, k e, k e"
    OUT = "b h q e, b h q" if online else "b h q e"
    RES = (", b h q e, b h q, b h q e, b h q"  # out, lse, g, g_lse
           if online else ", b h q e")         # just g
    if spmd:
        # mask/no-mask variants: None can't ride through a custom call
        fwd_mask = _spmd_wrap(
            fwd_impl, f"{QKV}, b k, {TABLES} -> {OUT}")
        fwd_nomask = _spmd_wrap(
            lambda q, k, v, *t: fwd_impl(q, k, v, None, *t),
            f"{QKV}, {TABLES} -> {OUT}")
        bwd_mask = _spmd_wrap(
            bwd_impl, f"{QKV}, b k, {TABLES}{RES} -> {QKV}")
        bwd_nomask = _spmd_wrap(
            lambda q, k, v, *t: bwd_impl(q, k, v, None, *t),
            f"{QKV}, {TABLES}{RES} -> {QKV}")
    else:
        fwd_mask = fwd_impl
        fwd_nomask = lambda q, k, v, *t: fwd_impl(q, k, v, None, *t)
        bwd_mask = bwd_impl
        bwd_nomask = lambda q, k, v, *t: bwd_impl(q, k, v, None, *t)

    def run_fwd(q, k, v, kmask, qcos, qsin, kcos, ksin):
        if kmask is None:
            return fwd_nomask(q, k, v, qcos, qsin, kcos, ksin)
        return fwd_mask(q, k, v, kmask, qcos, qsin, kcos, ksin)

    def run_bwd(q, k, v, kmask, qcos, qsin, kcos, ksin, *res_and_g):
        if kmask is None:
            return bwd_nomask(q, k, v, qcos, qsin, kcos, ksin, *res_and_g)
        return bwd_mask(q, k, v, kmask, qcos, qsin, kcos, ksin, *res_and_g)

    @jax.custom_vjp
    def f(q, k, v, kmask, qcos, qsin, kcos, ksin):
        res = run_fwd(q, k, v, kmask, qcos, qsin, kcos, ksin)
        if with_lse:
            return res
        return res[0] if online else res

    def fwd(q, k, v, kmask, qcos, qsin, kcos, ksin):
        if online:
            out, lse = run_fwd(q, k, v, kmask, qcos, qsin, kcos, ksin)
        else:
            out, lse = run_fwd(q, k, v, kmask, qcos, qsin, kcos, ksin), None
        res = (q, k, v, kmask, qcos, qsin, kcos, ksin,
               out if online else None, lse)
        if with_lse:
            return (out, lse), res
        return out, res

    def bwd(res, g):
        q, k, v, kmask, qcos, qsin, kcos, ksin, out, lse = res
        b, h, s_q, _ = q.shape
        g_lse = None
        if with_lse:
            g, g_lse = g
        if online:
            if g_lse is None:
                g_lse = jnp.zeros((b, h, s_q), jnp.float32)
            dq, dk, dv = run_bwd(q, k, v, kmask, qcos, qsin, kcos, ksin,
                                 out, lse, g, g_lse)
        else:
            dq, dk, dv = run_bwd(q, k, v, kmask, qcos, qsin, kcos, ksin, g)
        zeros = lambda t: None if t is None else jnp.zeros_like(t)
        return (dq, dk, dv, zeros(kmask),
                jnp.zeros_like(qcos), jnp.zeros_like(qsin),
                jnp.zeros_like(kcos), jnp.zeros_like(ksin))

    f.defvjp(fwd, bwd)
    return f


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def flash_mha(q, k, v, *, scale: float, causal: bool = False,
              attention_mask: Optional[jnp.ndarray] = None,
              qcos=None, qsin=None, kcos=None, ksin=None,
              block_q: Optional[int] = None,
              block_k: int = DEFAULT_BLOCK_K,
              force_online: Optional[bool] = None,
              interpret: Optional[bool] = None,
              return_lse: bool = False,
              spmd: bool = True):
    """Fused rotary + attention. q/k/v: (b, h, s, d). The four tables are
    (s, d) fp32 (identity rotation when None). K/V stream blockwise with an
    online softmax when s_k > K_RESIDENT_LIMIT (or force_online=True).

    Sequence axes are zero-padded up to block multiples OUTSIDE the kernels
    (identity rotation rows; padded keys masked via the additive kmask), and
    the output sliced back. Out-of-bounds Pallas block reads have undefined
    content — 0 * garbage = NaN inside accumulators — so the kernels only
    ever see exactly-divisible shapes; this also satisfies the TPU lowering
    rule that block dims divide the array dims."""
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
    if return_lse:
        online = True  # lse is a product of the online forward

    # Resident-BACKWARD scoped-VMEM model (hardware-calibrated, r5). The
    # q-blocked backward's scoped footprint is DOMINATED by the per-(s_k,d)
    # residents (K/V + their fp32 conversions + kcos/ksin + rotated copies
    # + dk/dv accumulators + double-buffering), NOT the (block_q, s_k)
    # score blocks: on chip, (s_k=4096, d=96) aborts at 21.08 MiB with
    # bq=256 and still 19.87 MiB with bq=128 — only 9.7 KiB per q-row —
    # while (2048, 96, bq=512) fits. est = 50*s_k*d + 2.36*bq*s_k bytes
    # reproduces all three points (18.7+2.4 / 18.7+1.2 / 9.4+2.4 MiB).
    # Consequence: past s_k*d ~ 325k (s=3456 at d=96) NO bq fits and the
    # kernel must take the streaming backward (O(block^2) scratch); below
    # it the cap shrinks bq only where needed (s<=2048 configs unchanged).
    _RES_BWD_BUDGET = int(15.5 * 1024 * 1024)   # 0.5 MiB model margin

    def _resident_bq_cap():
        room = _RES_BWD_BUDGET - 50 * s_k * d
        return (int(room / (2.36 * s_k)) // 128) * 128 if room > 0 else 0

    if block_q is None and not online and _resident_bq_cap() < DEFAULT_BLOCK_Q:
        online = True   # even 128-row q blocks can't fit the resident bwd

    bk = min(int(block_k), s_k) if online else s_k
    if block_q is None:
        # auto q-block sized to a ~4 MB VMEM budget for the fp32 score
        # block. Resident path: the score block is (block_q, s_k); online
        # path: only (block_q, block_k) is live, so block_q can stay large
        # at any sequence length. Fewer, larger q blocks win decisively
        # (s=512 resident: whole-q 1.6x over 128-row blocks; s=8192
        # streaming grad: bq=1024 2.3x over bq=128 — measured on v5e).
        k_extent = bk if online else s_k
        block_q = max(DEFAULT_BLOCK_Q, (4 * 1024 * 1024) // (4 * k_extent))
        if not online:
            block_q = min(block_q,
                          max(DEFAULT_BLOCK_Q, _resident_bq_cap()))
        if online:
            # The streaming BACKWARD's scoped-VMEM high-water mark holds
            # TWO (bq, bk) fp32 score blocks (p and ds) plus ~a dozen
            # double-buffered (bq|bk, d) operand blocks, and the 16 MB
            # scoped limit is real on hardware: bq=bk=1024 at d=96 aborts
            # the TPU compile at 16.77 MB (found by scripts/
            # probe_ring_chip.py — interpret mode never sees VMEM). Cap
            # the auto bq so the 4*(2*bq*bk + 12*(bq+bk)*d) estimate stays
            # under 15 MB; at d=64 the cap resolves to the measured-optimal
            # 1024, so the round-2 streaming defaults are unchanged.
            cap = (((15 * 1024 * 1024) // 4 - 12 * k_extent * d)
                   // (2 * k_extent + 12 * d))
            cap = max(DEFAULT_BLOCK_Q, (cap // 128) * 128)
            block_q = min(block_q, cap)
    bq = min(int(block_q), s_q)
    if not interpret:
        # TPU lowering: block sublane dims must divide by the dtype tile
        # (16 covers bf16); a non-full kmask row block needs a lane dim
        # divisible by 128.
        bq = _round_up(bq, 16)
        if online:
            bk = _round_up(bk, 128)
    pad_q = _round_up(s_q, bq) - s_q
    pad_k = (_round_up(s_k, bk) - s_k) if online else 0
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        qcos = jnp.pad(qcos, ((0, pad_q), (0, 0)), constant_values=1.0)
        qsin = jnp.pad(qsin, ((0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        kcos = jnp.pad(kcos, ((0, pad_k), (0, 0)), constant_values=1.0)
        ksin = jnp.pad(ksin, ((0, pad_k), (0, 0)))
        if kmask is None:  # padded keys must not enter the softmax
            kmask = jnp.ones((1, s_k), jnp.float32)  # broadcast over batch
        kmask = jnp.pad(kmask, ((0, 0), (0, pad_k)))
    if spmd and kmask is not None and kmask.shape[0] == 1 and b > 1:
        # the SPMD sharding rule maps the mask's leading dim to the batch
        # factor — materialize the broadcast (tiny: b x s_k fp32)
        kmask = jnp.broadcast_to(kmask, (b, kmask.shape[1]))
    fn = _make_flash(float(scale), bool(causal), h, bq,
                     bool(interpret), online=bool(online), block_k=bk,
                     with_lse=bool(return_lse), spmd=bool(spmd))
    if return_lse:
        out, lse = fn(q, k, v, kmask, qcos, qsin, kcos, ksin)
        if pad_q:
            out, lse = out[:, :, :s_q], lse[:, :, :s_q]
        return out, lse[..., None]
    out = fn(q, k, v, kmask, qcos, qsin, kcos, ksin)
    return out[:, :, :s_q] if pad_q else out
