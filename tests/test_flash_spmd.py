"""SPMD partitioning of the Pallas flash kernel under plain jit/pjit.

Without rules, XLA treats a custom call as opaque: a batch-sharded
jit(grad(flash_attention)) over the 8-device mesh came back fully
REPLICATED (all-gather + replicated kernel — measured before the fix).
`_spmd_wrap` (ops/flash/kernel.py) teaches Shardy/the partitioner to shard
the kernel over the batch AND head mesh axes and keep sequence/feature
replicated, so the flagship DP train step and megatron-TP head sharding
partition the kernel instead of serializing it on every device."""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multi-device SPMD kernel sweeps

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from meant_tpu import ops
from meant_tpu.ops.flash import flash_attention
from meant_tpu.parallel import make_mesh


def _qkv(b, h, s, d, seed=0):
    rng = np.random.RandomState(seed)
    return tuple(jnp.asarray(rng.randn(b, h, s, d).astype(np.float32) * .5)
                 for _ in range(3))


def _sharded_case(spec, b=16, h=4, s=256, d=32, mask=True, axes=("data",),
                  shape=None):
    mesh = make_mesh(axes=axes, shape=shape) if shape else make_mesh(
        axes=axes)
    q, k, v = _qkv(b, h, s, d)
    m = None
    if mask:
        mnp = np.ones((b, s), np.float32)
        mnp[:, s - s // 4:] = 0
        m = jnp.asarray(mnp)
    sh = NamedSharding(mesh, spec)
    qs, ks, vs = (jax.device_put(t, sh) for t in (q, k, v))
    ms = None
    if m is not None:
        ms = jax.device_put(m, NamedSharding(mesh, P(spec[0], None)))
    return mesh, (q, k, v, m), (qs, ks, vs, ms)


def _check(spec, *, mask, force_online=False, axes=("data",), shape=None,
           h=4):
    mesh, (q, k, v, m), (qs, ks, vs, ms) = _sharded_case(
        spec, mask=mask, axes=axes, shape=shape, h=h)
    scale = 0.18

    def fl(q_, k_, v_, m_):
        return flash_attention(q_, k_, v_, scale=scale, causal=True,
                               attention_mask=m_)

    def loss(q_, k_, v_, m_):
        return jnp.sum(fl(q_, k_, v_, m_) ** 2)

    out = jax.jit(fl)(qs, ks, vs, ms)
    ref = ops.attend(q, k, v, scale=scale, causal=True, attention_mask=m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # the kernel must have PARTITIONED: output keeps the input sharding
    assert out.sharding.spec[0] == spec[0], out.sharding
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks, vs, ms)
    gr = jax.grad(
        lambda a, b_, c: jnp.sum(ops.attend(
            a, b_, c, scale=scale, causal=True,
            attention_mask=m) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-5)
        assert a.sharding.spec[0] == spec[0], a.sharding


@pytest.mark.parametrize("mask", [True, False])
def test_flash_partitions_over_batch(mask):
    _check(P("data"), mask=mask)


def test_flash_partitions_over_heads():
    """Megatron TP shards attention heads — axis 1. Kernels derive the
    head count from local shapes, so an 8-way head shard must work."""
    mesh, (q, k, v, m), (qs, ks, vs, ms) = _sharded_case(
        P(None, "data"), b=4, h=8, mask=True)
    scale = 0.18
    out = jax.jit(lambda a, b_, c, m_: flash_attention(
        a, b_, c, scale=scale, causal=True, attention_mask=m_))(
            qs, ks, vs, ms)
    ref = ops.attend(q, k, v, scale=scale, causal=True, attention_mask=m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    assert out.sharding.spec[1] == "data", out.sharding


def test_flash_partitions_online_path():
    """Streaming (online-softmax) kernels partition too."""
    mesh, (q, k, v, m), (qs, ks, vs, ms) = _sharded_case(
        P("data"), b=8, s=256, mask=True)
    scale = 0.18

    def loss(q_, k_, v_, m_):
        from meant_tpu.ops.flash.kernel import flash_mha
        return jnp.sum(flash_mha(q_, k_, v_, scale=scale, causal=True,
                                 attention_mask=m_,
                                 force_online=True) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks, vs, ms)
    gr = jax.grad(
        lambda a, b_, c: jnp.sum(ops.attend(
            a, b_, c, scale=scale, causal=True,
            attention_mask=m) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-5)
        assert a.sharding.spec[0] == "data", a.sharding


def test_full_model_dp_with_flash_matches_single_device():
    """The FLAGSHIP multi-chip config end to end: meant_src with
    flash=True, batch sharded over the 8-device mesh under plain jit —
    model + kernel + partitioner compose; loss/grads == single device."""
    from meant_tpu.models import EmbeddingConfig
    from meant_tpu.models.meant_src import meant_src
    from meant_tpu.parallel import batch_sharding

    mesh = make_mesh()
    b, lag, s = 8, 2, 32
    model = meant_src(
        text_dim=64, image_dim=64, price_dim=5, height=32, width=32,
        patch_res=16, lag=lag, num_classes=2,
        embedding=EmbeddingConfig(vocab_size=128, hidden_size=64,
                                  max_position_embeddings=40, dropout=0.0),
        num_heads=4, num_encoders=2, channels=3, seq_len=s, flash=True)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(2, 128, (b, lag, s)), jnp.int32)
    pix = jnp.asarray(rng.randn(b, lag, 3, 32, 32), jnp.float32)
    prices = jnp.asarray(rng.randn(b, lag, 5), jnp.float32)
    mask = np.ones((b, lag, s), np.float32)
    mask[:, :, 24:] = 0
    mask = jnp.asarray(mask)
    params = model.init(jax.random.PRNGKey(0), ids, pix, prices,
                        mask)["params"]

    def loss(p, i, px, pr, m):
        out = model.apply({"params": p}, i, px, pr, m)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    l0, g0 = jax.value_and_grad(loss)(params, ids, pix, prices, mask)

    sh = batch_sharding(mesh)
    args = [jax.device_put(t, sh) for t in (ids, pix, prices, mask)]
    l1, g1 = jax.jit(jax.value_and_grad(loss))(params, *args)

    assert abs(float(l0) - float(l1)) < 1e-6
    diffs = jax.tree.map(
        lambda a, b_: float(np.max(np.abs(np.asarray(a) - np.asarray(b_)))),
        g0, g1)
    assert max(jax.tree.leaves(diffs)) < 1e-5
