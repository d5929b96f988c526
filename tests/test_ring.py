"""Ring attention (sequence-parallel over the mesh) vs ops.attend on the
8-device CPU mesh."""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # interpret-mode Pallas ring engine

import jax
import jax.numpy as jnp

from meant_tpu import ops
from meant_tpu.ops.ring import ring_attend
from meant_tpu.parallel import make_mesh


def make_qkv(b=2, h=4, s=256, d=32, seed=0):
    rng = np.random.RandomState(seed)
    return tuple(jnp.asarray(rng.randn(b, h, s, d).astype(np.float32) * 0.5)
                 for _ in range(3))


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_attend(causal):
    mesh = make_mesh()  # 1-D data mesh over all 8 CPU devices
    q, k, v = make_qkv()
    scale = 1.0 / np.sqrt(32)
    out = ring_attend(q, k, v, mesh=mesh, scale=scale, causal=causal)
    ref = ops.attend(q, k, v, scale=scale, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_ring_with_padding_mask():
    mesh = make_mesh()
    q, k, v = make_qkv(b=2, s=128, seed=1)
    mask = np.ones((2, 128), np.float32)
    mask[0, 100:] = 0
    mask[1, 40:] = 0
    scale = 0.125
    out = ring_attend(q, k, v, mesh=mesh, scale=scale, causal=True,
                      attention_mask=jnp.asarray(mask))
    ref = ops.attend(q, k, v, scale=scale, causal=True,
                     attention_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_ring_grads_match_attend():
    mesh = make_mesh()
    q, k, v = make_qkv(b=1, h=2, s=64, d=16, seed=2)
    scale = 0.25

    def loss_ring(q_, k_, v_):
        return jnp.sum(ring_attend(q_, k_, v_, mesh=mesh, scale=scale,
                                   causal=True) ** 2)

    def loss_ref(q_, k_, v_):
        return jnp.sum(ops.attend(q_, k_, v_, scale=scale, causal=True)
                       ** 2)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_language_encoder_ring_matches_dense():
    """Sequence-parallel LanguageEncoder (ring attention inside the module,
    activations sequence-sharded under jit) == the dense encoder."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from meant_tpu.nn.encoders import LanguageEncoder

    mesh = make_mesh()
    d, h, s = 32, 4, 256
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(2, s, d).astype(np.float32) * 0.5)
    mask = np.ones((2, s), np.float32)
    mask[0, 200:] = 0

    dense = LanguageEncoder(d, h)
    params = dense.init(jax.random.PRNGKey(0), x, jnp.asarray(mask))
    ref = dense.apply(params, x, jnp.asarray(mask))

    ring_enc = LanguageEncoder(d, h, ring_mesh=mesh, ring_axis="data")
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "data", None)))
    ms = jax.device_put(jnp.asarray(mask),
                        NamedSharding(mesh, P(None, "data")))
    out = jax.jit(lambda p, x_, m_: ring_enc.apply(p, x_, m_))(
        params, xs, ms)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_language_encoder_ring_grads():
    from meant_tpu.nn.encoders import LanguageEncoder

    mesh = make_mesh()
    d, h, s = 32, 4, 64
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(2, s, d).astype(np.float32) * 0.5)
    dense = LanguageEncoder(d, h)
    params = dense.init(jax.random.PRNGKey(1), x, None)
    ring_enc = LanguageEncoder(d, h, ring_mesh=mesh, ring_axis="data")

    gd = jax.grad(lambda p: jnp.sum(dense.apply(p, x, None) ** 2))(params)
    gr = jax.grad(lambda p: jnp.sum(ring_enc.apply(p, x, None) ** 2))(
        params)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(gd)[0],
            jax.tree_util.tree_flatten_with_path(gr)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4,
                                   err_msg=str(pa))


@pytest.mark.parametrize("causal", [False, True])
def test_ring_flash_matches_attend(causal):
    """Flash-engine ring (Pallas kernel per chunk, interpret mode on CPU,
    s_loc = 512 per device) == dense attention (VERDICT r2 #7)."""
    mesh = make_mesh()
    n = len(jax.devices())
    q, k, v = make_qkv(b=1, h=2, s=512 * n, d=32, seed=3)
    scale = 1.0 / np.sqrt(32)
    out = ring_attend(q, k, v, mesh=mesh, scale=scale, causal=causal,
                      use_flash=True)
    ref = ops.attend(q, k, v, scale=scale, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_ring_flash_with_padding_mask():
    mesh = make_mesh()
    n = len(jax.devices())
    s = 512 * n
    q, k, v = make_qkv(b=2, h=2, s=s, d=32, seed=4)
    mask = np.ones((2, s), np.float32)
    mask[0, s - 700:] = 0
    mask[1, 1000:] = 0
    scale = 0.125
    out = ring_attend(q, k, v, mesh=mesh, scale=scale, causal=True,
                      attention_mask=jnp.asarray(mask), use_flash=True)
    ref = ops.attend(q, k, v, scale=scale, causal=True,
                     attention_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_ring_flash_grads_match_attend():
    """Grads flow through the joint (out, lse) kernel VJP + the XLA
    online-softmax combine + the ppermute rotations."""
    mesh = make_mesh()
    n = len(jax.devices())
    q, k, v = make_qkv(b=1, h=1, s=128 * n, d=16, seed=5)
    scale = 0.25

    def loss_ring(q_, k_, v_):
        return jnp.sum(ring_attend(q_, k_, v_, mesh=mesh, scale=scale,
                                   causal=True, use_flash=True) ** 2)

    def loss_ref(q_, k_, v_):
        return jnp.sum(ops.attend(q_, k_, v_, scale=scale, causal=True)
                       ** 2)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_language_encoder_ring_flash_matches_dense():
    """In-model sequence-parallel mode with the PALLAS ring engine
    (LanguageEncoder(ring_mesh=..., ring_flash=True)) == dense encoder."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from meant_tpu.nn.encoders import LanguageEncoder

    mesh = make_mesh()
    d, h, s = 32, 4, 256
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, s, d).astype(np.float32) * 0.5)
    mask = np.ones((2, s), np.float32)
    mask[0, 200:] = 0

    dense = LanguageEncoder(d, h)
    params = dense.init(jax.random.PRNGKey(0), x, jnp.asarray(mask))
    ref = dense.apply(params, x, jnp.asarray(mask))

    ring_enc = LanguageEncoder(d, h, ring_mesh=mesh, ring_axis="data",
                               ring_flash=True)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "data", None)))
    ms = jax.device_put(jnp.asarray(mask),
                        NamedSharding(mesh, P(None, "data")))
    out = jax.jit(lambda p, x_, m_: ring_enc.apply(p, x_, m_))(
        params, xs, ms)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
