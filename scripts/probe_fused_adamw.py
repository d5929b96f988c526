"""Probe: is a fused Pallas AdamW faster than XLA's optimizer pass?

The flagship trace books ~7.1 ms/step to the optax update (109M params:
read p/m/v/g fp32 + write p/m/v = ~3.05 GB of HBM traffic = 3.8 ms at
roofline). If XLA is leaving 2x on the table, a single fused elementwise
kernel should show it; if XLA is already near-roofline for the real
chained transform (clip-by-global-norm + adamw + schedule), record that
and move on ("measure, don't assume").
"""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

N = 104 * 1024 * 1024  # ~109M params, divisible into (1024,1024) blocks
LR, B1, B2, EPS, WD = 1e-4, 0.9, 0.999, 1e-8, 0.0


def bench(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


# ---- XLA reference: the plain fused-adamw math under one jit ------------
@jax.jit
def xla_adamw(p, m, v, g, step):
    m = B1 * m + (1 - B1) * g
    v = B2 * v + (1 - B2) * g * g
    mhat = m / (1 - B1 ** step)
    vhat = v / (1 - B2 ** step)
    p = p - LR * (mhat / (jnp.sqrt(vhat) + EPS) + WD * p)
    return p, m, v


# ---- optax: the production transform (clip + adamw + schedule) ----------
def optax_update():
    import optax
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(LR, b1=B1, b2=B2, weight_decay=WD))

    @jax.jit
    def step(p, g, state):
        up, state = tx.update(g, state, p)
        return optax.apply_updates(p, up), state
    return tx, step


# ---- Pallas fused kernel ------------------------------------------------
def _kernel(p_ref, m_ref, v_ref, g_ref, c1_ref, c2_ref,
            po_ref, mo_ref, vo_ref):
    g = g_ref[...]
    m = B1 * m_ref[...] + (1 - B1) * g
    v = B2 * v_ref[...] + (1 - B2) * g * g
    mhat = m * c1_ref[0]
    vhat = v * c2_ref[0]
    po_ref[...] = p_ref[...] - LR * mhat / (jnp.sqrt(vhat) + EPS)
    mo_ref[...] = m
    vo_ref[...] = v


@jax.jit
def pallas_adamw(p, m, v, g, step):
    c1 = (1.0 / (1 - B1 ** step))[None]
    c2 = (1.0 / (1 - B2 ** step))[None]
    rows = p.size // 1024
    shape = (rows, 1024)
    blk = 256  # (256,1024) fp32 = 1 MB/buffer; 7 buffers double-buffered < the 16 MB scoped-vmem limit
    grid = (rows // blk,)
    spec = pl.BlockSpec((blk, 1024), lambda i: (i, 0))
    sspec = pl.BlockSpec(memory_space=pl.ANY)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[spec, spec, spec, spec,
                  pl.BlockSpec((1,), lambda i: (0,)),
                  pl.BlockSpec((1,), lambda i: (0,))],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32)] * 3,
    )(p.reshape(shape), m.reshape(shape), v.reshape(shape),
      g.reshape(shape), c1, c2)
    return tuple(o.reshape(p.shape) for o in out)


def main():
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    p = jax.random.normal(key, (N,), jnp.float32)
    g = jax.random.normal(key, (N,), jnp.float32) * 1e-3
    m = jnp.zeros((N,), jnp.float32)
    v = jnp.zeros((N,), jnp.float32) + 1e-6
    step = jnp.asarray(10.0)

    t_xla = bench(xla_adamw, p, m, v, g, step)
    print(f"xla fused-math adamw: {t_xla*1e3:.2f} ms "
          f"({N*28/t_xla/1e9:.0f} GB/s)", flush=True)

    t_pl = bench(pallas_adamw, p, m, v, g, step)
    print(f"pallas fused adamw:   {t_pl*1e3:.2f} ms "
          f"({N*28/t_pl/1e9:.0f} GB/s)", flush=True)

    # numerics check
    ref = xla_adamw(p, m, v, g, step)
    got = pallas_adamw(p, m, v, g, step)
    for a, b in zip(ref, got):
        d = float(jnp.max(jnp.abs(a - b)))
        assert d < 1e-6, d
    print("numerics ok", flush=True)

    tx, step_fn = optax_update()
    state = tx.init(p)
    t_ox = bench(step_fn, p, g, state)
    print(f"optax chain (clip+adamw): {t_ox*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
