"""VERDICT r3 #2: execute the ring engine's EXACT kernel configuration on
the real TPU chip (until now it was only validated in interpret mode on the
CPU mesh, tests/test_ring.py).

Leg 1 — kernel surface: `flash_mha(return_lse=True, force_online=True)` —
the per-chunk configuration `ops/ring.ring_flash_local` uses — forward +
backward on-chip, numerics vs the dense reference (out AND lse both carry
cotangents, exercising the joint (out, lse) custom VJP).

Leg 2 — ring path: `ring_flash_local` under shard_map on a ONE-device mesh
(degenerate ring: n=1 takes the same code path — gated kernel call, lse
online combine, ppermute-free tail — with real TPU lowering), fwd + grads
vs dense.

Run serially on the chip:  python scripts/probe_ring_chip.py
"""

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp


def dense_out_lse(q, k, v, scale, causal):
    with jax.default_matmul_precision("highest"):
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * scale
        if causal:
            sq, sk = s.shape[-2], s.shape[-1]
            mask = jnp.tril(jnp.ones((sq, sk), bool))
            s = jnp.where(mask, s, -jnp.inf)
        lse = jax.nn.logsumexp(s, axis=-1, keepdims=True)
        out = jnp.einsum("bhqk,bhkd->bhqd", jnp.exp(s - lse),
                         v.astype(jnp.float32))
    return out.astype(q.dtype), lse


def leg1_kernel_surface():
    from meant_tpu.ops.flash.kernel import flash_mha

    b, h, s, d = 4, 8, 2048, 96
    scale = d ** -0.5
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32) * 0.5)

    def loss_kernel(q, k, v):
        out, lse = flash_mha(q, k, v, scale=scale, causal=True,
                             force_online=True, return_lse=True)
        # BOTH outputs carry cotangents -> the joint (out, lse) VJP runs
        return jnp.sum(out ** 2) + 1e-3 * jnp.sum(lse ** 2)

    def loss_dense(q, k, v):
        out, lse = dense_out_lse(q, k, v, scale, causal=True)
        return jnp.sum(out ** 2) + 1e-3 * jnp.sum(lse ** 2)

    t0 = time.perf_counter()
    out, lse = jax.jit(lambda a, b_, c: flash_mha(
        a, b_, c, scale=scale, causal=True, force_online=True,
        return_lse=True))(q, k, v)
    ref_out, ref_lse = dense_out_lse(q, k, v, scale, causal=True)
    out_diff = float(jnp.max(jnp.abs(out - ref_out)))
    lse_diff = float(jnp.max(jnp.abs(lse - ref_lse)))
    print(f"leg1 fwd  (s={s}, online+lse, compile+run "
          f"{time.perf_counter() - t0:.1f}s): |out-dense|={out_diff:.2e} "
          f"|lse-dense|={lse_diff:.2e}", flush=True)

    g_k = jax.jit(jax.grad(loss_kernel, argnums=(0, 1, 2)))(q, k, v)
    g_d = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    g_diff = max(float(jnp.max(jnp.abs(a - b_))) for a, b_ in zip(g_k, g_d))
    # scale-aware: compare against the largest gradient magnitude
    g_mag = max(float(jnp.max(jnp.abs(a))) for a in g_d)
    print(f"leg1 bwd  joint (out,lse) VJP: max |grad-dense|={g_diff:.2e} "
          f"(max |dense grad|={g_mag:.1f}, rel={g_diff / g_mag:.2e})",
          flush=True)
    assert out_diff < 5e-3 and lse_diff < 5e-3 and g_diff / g_mag < 1e-2
    return out_diff, lse_diff, g_diff / g_mag


def leg2_ring_path():
    from jax.sharding import Mesh
    from meant_tpu.ops import attend
    from meant_tpu.ops.ring import make_ring_attention

    b, h, s, d = 2, 8, 1024, 96
    scale = d ** -0.5
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.randn(b, h, s, d).astype(np.float32) * 0.5)
    mask = jnp.ones((b, s), jnp.float32)

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("sp",))
    ring = make_ring_attention(mesh, scale=scale, causal=True, axis="sp",
                               use_flash=True)

    t0 = time.perf_counter()
    out = jax.jit(ring)(q, k, v, mask)
    ref = attend(q, k, v, scale=scale, causal=True)
    out_diff = float(jnp.max(jnp.abs(out - ref)))
    print(f"leg2 fwd  ring_flash_local on a 1-device TPU mesh "
          f"(compile+run {time.perf_counter() - t0:.1f}s): "
          f"|out-dense|={out_diff:.2e}", flush=True)

    g_r = jax.jit(jax.grad(
        lambda a, b_, c: jnp.sum(ring(a, b_, c, mask) ** 2),
        argnums=(0, 1, 2)))(q, k, v)
    g_d = jax.grad(
        lambda a, b_, c: jnp.sum(attend(a, b_, c, scale=scale,
                                        causal=True) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    g_diff = max(float(jnp.max(jnp.abs(a - b_))) for a, b_ in zip(g_r, g_d))
    g_mag = max(float(jnp.max(jnp.abs(a))) for a in g_d)
    print(f"leg2 bwd  ring grads vs dense: max diff={g_diff:.2e} "
          f"(rel={g_diff / g_mag:.2e})", flush=True)
    assert out_diff < 5e-3 and g_diff / g_mag < 1e-2
    return out_diff, g_diff / g_mag


def main():
    print("platform:", jax.devices()[0].platform, jax.devices(), flush=True)
    leg1_kernel_surface()
    leg2_ring_path()
    print("RING CHIP PROBE: PASS", flush=True)


if __name__ == "__main__":
    main()
