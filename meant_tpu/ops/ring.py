"""Ring attention: sequence-parallel exact attention over a device mesh.

Beyond reference parity (SURVEY §5.7 lists it as the natural next step once
the flash kernel is blockwise): the sequence axis is sharded over a mesh
axis, each device holds one q/k/v chunk, and K/V chunks rotate around the
ring via `jax.lax.ppermute` while an online softmax (same math as the
streaming flash kernel, `ops/flash/kernel.py`) accumulates — peak memory
per device is O(s_local^2) for scores and communication rides the ICI ring.

Layering: `ring_attention_local` is the per-device SPMD body (use inside
your own shard_map); `ring_attend` wraps it in shard_map over a mesh for
the common (b, h, s, d) case.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _online_update(carry, scores, v_cur):
    """One online-softmax accumulation step. scores fp32 (b, h, sq, sk_loc),
    v_cur (b, h, sk_loc, d)."""
    m, l, acc = carry
    m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    p = jnp.exp(scores - m_safe)
    p = jnp.where(jnp.isfinite(scores), p, 0.0)
    corr = jnp.where(jnp.isfinite(m), jnp.exp(m - m_safe), 0.0)
    l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc * corr + jnp.einsum(
        "bhqk,bhkd->bhqd", p, v_cur.astype(jnp.float32))
    return m_new, l, acc


def ring_flash_local(q, k, v, kmask=None, *, scale: float,
                     causal: bool = False, axis_name: str = "sp",
                     block_q=None, block_k=None, interpret=None):
    """Ring attention with the PALLAS flash kernel as the per-chunk engine
    (VERDICT r2 #7): each ring step runs `flash_mha(..., return_lse=True)`
    on the local q against the current K/V chunk — no (s_loc, s_loc) fp32
    score materialization; VMEM-blocked like the main model's attention —
    and the per-chunk (out, lse) pairs merge across the ring with an
    online-softmax combine in XLA. Differentiable end to end: the kernel's
    joint (out, lse) custom VJP folds the lse cotangent into delta, and the
    ppermute rotations transpose under autodiff.

    Same signature/semantics as `ring_attention_local`. Causality across
    chunks: step 0 attends the diagonal chunk with the causal kernel; step
    i>0 holds chunk (idx - i) mod n, fully visible when idx >= i and fully
    masked (zero combine weight) otherwise — the same wraparound schedule
    as the dense body, with whole masked chunks costing one gated kernel
    call instead of a dense -inf score block."""
    from meant_tpu.ops.flash.kernel import flash_mha

    n = jax.lax.psum(1, axis_name)                     # static mesh extent
    idx = jax.lax.axis_index(axis_name)
    b, h, s_loc, d = q.shape

    perm = [(j, (j + 1) % n) for j in range(n)]
    kw = dict(scale=scale, block_k=block_k or 512, interpret=interpret,
              force_online=True, return_lse=True, spmd=False)
    if block_q is not None:
        kw["block_q"] = block_q

    m = jnp.full((b, h, s_loc, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, h, s_loc, 1), jnp.float32)
    acc = jnp.zeros((b, h, s_loc, d), jnp.float32)
    k_cur = k
    v_cur = v
    km_cur = (jnp.ones((b, s_loc), jnp.float32) if kmask is None
              else kmask.astype(jnp.float32))
    for i in range(n):
        out_i, lse_i = flash_mha(q, k_cur, v_cur, causal=causal and i == 0,
                                 attention_mask=km_cur, **kw)
        if causal and i > 0:
            # chunk (idx - i) mod n is in the past iff idx >= i
            vis = (idx >= i)
            lse_i = jnp.where(vis, lse_i, -jnp.inf)
        m_new = jnp.maximum(m, lse_i)
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        r = jnp.where(jnp.isfinite(m), jnp.exp(m - m_safe), 0.0)
        r_i = jnp.where(jnp.isfinite(lse_i), jnp.exp(lse_i - m_safe), 0.0)
        l = l * r + r_i
        acc = acc * r + out_i.astype(jnp.float32) * r_i
        m = m_new
        if i < n - 1:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
            km_cur = jax.lax.ppermute(km_cur, axis_name, perm)
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention_local(q, k, v, kmask=None, *, scale: float,
                         causal: bool = False, axis_name: str = "sp"):
    """SPMD per-device body. q/k/v: LOCAL chunks (b, h, s_loc, d) of a
    sequence sharded over `axis_name`; kmask: local (b, s_loc) {0,1} or
    None. Returns the local output chunk (b, h, s_loc, d)."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, h, s_loc, d = q.shape
    qf = q.astype(jnp.float32)
    row = idx * s_loc + jnp.arange(s_loc)                  # global q rows

    perm = [(j, (j + 1) % n) for j in range(n)]

    def body(i, carry):
        k_cur, v_cur, km_cur, m, l, acc = carry
        src = (idx - i) % n                                # chunk we hold
        scores = jnp.einsum("bhqd,bhkd->bhqk", qf,
                            k_cur.astype(jnp.float32)) * scale
        if causal:
            col = src * s_loc + jnp.arange(s_loc)
            scores = jnp.where(col[None, None, None, :]
                               <= row[None, None, :, None],
                               scores, -jnp.inf)
        scores = scores + (1.0 - km_cur)[:, None, None, :] * -1e9
        m, l, acc = _online_update((m, l, acc), scores, v_cur)
        # rotate K/V (and their mask) one step around the ring
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        km_cur = jax.lax.ppermute(km_cur, axis_name, perm)
        return k_cur, v_cur, km_cur, m, l, acc

    if kmask is None:
        kmask = jnp.ones((b, s_loc), jnp.float32)
    stats = (jnp.full((b, h, s_loc, 1), -jnp.inf, jnp.float32),
             jnp.zeros((b, h, s_loc, 1), jnp.float32),
             jnp.zeros((b, h, s_loc, d), jnp.float32))
    # Newer shard_map tracks device-varying axes: the constant-filled
    # m/l/acc carry inits must be marked varying to match the body's
    # outputs (k/v/kmask are already varying). jax.lax.pvary is the
    # deprecated spelling; prefer its replacement pcast(..., to='varying')
    # when present so the code tracks the API instead of silently
    # degrading once pvary is removed.
    if hasattr(jax.lax, "pcast"):
        _mark_varying = functools.partial(jax.lax.pcast, to="varying")
    elif hasattr(jax.lax, "pvary"):
        _mark_varying = jax.lax.pvary
    else:
        _mark_varying = None
    if _mark_varying is not None:
        stats = jax.tree.map(
            lambda x: (x if axis_name in getattr(jax.typeof(x), "vma", ())
                       else _mark_varying(x, axis_name)), stats)
    init = (k, v, kmask.astype(jnp.float32), *stats)
    *_, m, l, acc = jax.lax.fori_loop(0, n, body, init)
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def make_ring_attention(mesh: Mesh, *, scale: float, causal: bool = False,
                        axis: str = "data", use_flash: bool = False,
                        block_q=None, block_k=None, interpret=None):
    """shard_map-wrapped ring attention callable, usable from EAGER code or
    INSIDE a jitted function (no device placement — the caller's shardings
    or jit's SPMD partitioner provide it). Signature:
    fn(q, k, v, attention_mask) with global (b, h, s, d) arrays.
    use_flash routes every per-chunk attention through the Pallas flash
    kernel (`ring_flash_local`) — the right engine once s_loc is big enough
    that a dense (s_loc, s_loc) fp32 score block hurts."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    kw = {}
    if use_flash:
        body = functools.partial(ring_flash_local, scale=scale,
                                 causal=causal, axis_name=axis,
                                 block_q=block_q, block_k=block_k,
                                 interpret=interpret)
        # pallas_call out_shapes carry no varying-axis metadata; disable
        # the vma check for the flash body (newer jax: check_vma, older
        # spelling: check_rep)
        import inspect
        sig = inspect.signature(shard_map).parameters
        if "check_vma" in sig:
            kw["check_vma"] = False
        elif "check_rep" in sig:
            kw["check_rep"] = False
    else:
        body = functools.partial(ring_attention_local, scale=scale,
                                 causal=causal, axis_name=axis)
    seq_spec = P(None, None, axis, None)
    mask_spec = P(None, axis)
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, mask_spec),
        out_specs=seq_spec,
        **kw,
    )


def ring_attend(q, k, v, *, mesh: Mesh, scale: float, causal: bool = False,
                attention_mask: Optional[jnp.ndarray] = None,
                axis: str = "data", use_flash: bool = False):
    """Sequence-parallel attention: q/k/v (b, h, s, d) with s sharded over
    mesh axis `axis`. Matches ops.attend numerically (tested on the
    8-device CPU mesh)."""
    seq_spec = P(None, None, axis, None)
    mask_spec = P(None, axis)
    if attention_mask is None:
        attention_mask = jnp.ones((q.shape[0], k.shape[2]), jnp.float32)

    fn = make_ring_attention(mesh, scale=scale, causal=causal, axis=axis,
                             use_flash=use_flash)
    q = jax.device_put(q, NamedSharding(mesh, seq_spec))
    k = jax.device_put(k, NamedSharding(mesh, seq_spec))
    v = jax.device_put(v, NamedSharding(mesh, seq_spec))
    attention_mask = jax.device_put(
        attention_mask.astype(jnp.float32), NamedSharding(mesh, mask_spec))
    return fn(q, k, v, attention_mask)
