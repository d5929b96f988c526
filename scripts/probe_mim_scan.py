"""Why is the scanned MIM pretrainer 25x slower on chip? (round 4)

bench.py --workload mim: unrolled 947.8 samples/s (16.9 ms/step at b16) vs
--scan_layers 36.99 (432 ms/step). The flagship's scan cost is ~27%, so a
25x collapse is a pathology, not remat recompute. This probe isolates it:
per-step wall times + XLA memory_analysis for unrolled / scan+dots /
scan+full on the real chip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from meant_tpu.models.pretrainers import meant_vision_pretrainer
from meant_tpu.train.pretrain import mim_l1_loss


def run(tag, scan_layers, remat, dropout=False):
    model = meant_vision_pretrainer(
        num_encoders=12, channels=4, height=224, width=224, image_dim=768,
        num_heads=8, scan_layers=scan_layers, remat=remat,
        dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    b = 16
    imgs = jnp.asarray(rng.randn(b, 4, 224, 224).astype(np.float32))
    labels = jnp.asarray(
        np.where(rng.rand(b, 3, 224, 224) < 0.85, -100.0,
                 rng.randn(b, 3, 224, 224)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs)["params"]
    tx = optax.adamw(1e-4)
    opt = tx.init(params)

    def step(params, opt, imgs, labels, i):
        def loss_fn(p):
            if dropout:
                rng = jax.random.fold_in(jax.random.PRNGKey(0), i)
                out = model.apply({"params": p}, imgs, deterministic=False,
                                  rngs={"dropout": rng})
            else:
                out = model.apply({"params": p}, imgs, deterministic=True)
            return mim_l1_loss(out, labels)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    jstep = jax.jit(step, donate_argnums=(0, 1))
    lowered = jstep.lower(params, opt, imgs, labels, jnp.int32(0))
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    print(f"[{tag}] temps={ma.temp_size_in_bytes/2**30:.2f}G "
          f"args={ma.argument_size_in_bytes/2**30:.2f}G "
          f"gen={ma.generated_code_size_in_bytes/2**20:.1f}M")
    params, opt, loss = jstep(params, opt, imgs, labels, jnp.int32(0))
    print(f"[{tag}] warm loss={float(loss):.4f}")
    for i in range(5):
        t0 = time.perf_counter()
        params, opt, loss = jstep(params, opt, imgs, labels,
                                  jnp.int32(i + 1))
        lv = float(loss)   # tunnel-safe completion barrier
        print(f"[{tag}] step {i}: {(time.perf_counter()-t0)*1e3:.1f} ms "
              f"loss={lv:.4f}")
    # amortized block (the bench's measurement style: one barrier at the end)
    t0 = time.perf_counter()
    for i in range(12):
        params, opt, loss = jstep(params, opt, imgs, labels,
                                  jnp.int32(i + 6))
    float(loss)
    dt = (time.perf_counter() - t0) / 12
    print(f"[{tag}] amortized {dt*1e3:.1f} ms/step "
          f"= {16/dt:.1f} samples/s")


if __name__ == "__main__":
    run("unrolled+drop", False, False, dropout=True)
    run("scan+dots+drop", True, "dots", dropout=True)
    run("scan+dots", True, "dots")
