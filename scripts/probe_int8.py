"""Probe: does the v5e MXU deliver int8 speedup at MEANT shapes?

The tunnel has a ~3 ms per-dispatch floor, so each timing chains N
dependent matmuls inside ONE jit (lax.scan) and divides. Three variants:

  bf16  : x <- dot_bf16(x, w)            (the production path)
  q-dq  : x <- dq(dot_int8(q(x), q(w)))  (AQT-style dynamic quantization,
                                          weights pre-quantized per-channel)
  int8  : x <- requant(dot_int8(x, w))   (fully int8-resident chain; upper
                                          bound, ignores activation q cost)

If q-dq beats bf16 by >1.3x at (B*S, 768)x(768,768) / the FF pair, an
AQT-style quantized matmul path is worth building for training; otherwise
int8 stays a serving-only option.
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

N_CHAIN = 100


def bench(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters / N_CHAIN


def chain_bf16(x, w1, w2):
    def step(x, _):
        y = jnp.dot(x, w1, preferred_element_type=jnp.float32)
        y = (y * 1e-3).astype(jnp.bfloat16)
        z = jnp.dot(y, w2, preferred_element_type=jnp.float32)
        return (z * 1e-3).astype(jnp.bfloat16), ()
    return lax.scan(step, x, None, length=N_CHAIN // 2)[0]


def _q(x):
    s = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0 + 1e-9
    return jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127,
                    127).astype(jnp.int8), s


def chain_qdq(x, w1i, s1, w2i, s2):
    def step(x, _):
        xi, sx = _q(x)
        y = jnp.dot(xi, w1i, preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * (sx * s1) * 1e-3).astype(jnp.bfloat16)
        yi, sy = _q(y)
        z = jnp.dot(yi, w2i, preferred_element_type=jnp.int32)
        return (z.astype(jnp.float32) * (sy * s2) * 1e-3).astype(
            jnp.bfloat16), ()
    return lax.scan(step, x, None, length=N_CHAIN // 2)[0]


def chain_int8(xi, w1i, w2i):
    def step(xi, _):
        y = jnp.dot(xi, w1i, preferred_element_type=jnp.int32)
        yi = jnp.clip(y >> 8, -127, 127).astype(jnp.int8)
        z = jnp.dot(yi, w2i, preferred_element_type=jnp.int32)
        return jnp.clip(z >> 8, -127, 127).astype(jnp.int8), ()
    return lax.scan(step, xi, None, length=N_CHAIN // 2)[0]


def main():
    print("devices:", jax.devices(), flush=True)
    cases = [
        ("text proj  (8192,768)x(768,768)", 8192, 768, 768),
        ("text ff    (8192,768)x(768,3072)", 8192, 768, 3072),
        ("vision proj(3136,768)x(768,768)", 3136, 768, 768),
        ("ledger     (41472,768)x(768,768)", 41472, 768, 768),
        ("big square (4096,4096)x(4096,4096)", 4096, 4096, 4096),
    ]
    key = jax.random.PRNGKey(0)
    for name, m, k, n in cases:
        x = jax.random.normal(key, (m, k), jnp.bfloat16)
        w1 = jax.random.normal(key, (k, n), jnp.bfloat16)
        w2 = jax.random.normal(key, (n, k), jnp.bfloat16)
        w1i, s1 = _q(w1)
        w2i, s2 = _q(w2)
        xi, _ = _q(x)

        t_bf = bench(jax.jit(chain_bf16), x, w1, w2)
        t_q = bench(jax.jit(chain_qdq), x, w1i, s1, w2i, s2)
        t_i = bench(jax.jit(chain_int8), xi, w1i, w2i)
        fl = 2 * m * k * n  # per chained matmul
        print(f"{name}: bf16 {t_bf*1e6:8.1f} us ({fl/t_bf/1e12:6.1f} TF/s)"
              f" | q-dq {t_q*1e6:8.1f} us ({fl/t_q/1e12:6.1f})"
              f" | int8 {t_i*1e6:8.1f} us ({fl/t_i/1e12:6.1f})"
              f" | q-dq speedup {t_bf/t_q:5.2f}x  int8 {t_bf/t_i:5.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
