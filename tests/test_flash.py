"""Pallas flash-attention kernel vs the XLA reference path (interpret mode on
CPU; the same kernel compiles on TPU)."""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # interpret-mode Pallas kernel legs

import jax
import jax.numpy as jnp

from meant_tpu import ops
from meant_tpu.ops.flash import flash_attention


def make_qkv(b=2, h=4, s=128, d=64, seed=0):
    rng = np.random.RandomState(seed)
    return tuple(jnp.asarray(rng.randn(b, h, s, d).astype(np.float32) * 0.5)
                 for _ in range(3))


class TestFlashKernel:
    @pytest.mark.parametrize("causal", [False, True])
    def test_plain_attention(self, causal):
        q, k, v = make_qkv()
        scale = 1.0 / np.sqrt(64)
        out_f = flash_attention(q, k, v, scale=scale, causal=causal)
        out_r = ops.attend(q, k, v, scale=scale, causal=causal)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   rtol=1e-4, atol=1e-5)

    def test_non_multiple_block(self):
        # 196 patch tokens (vision) — not a multiple of the 128 q-block.
        q, k, v = make_qkv(s=196)
        scale = 1.0 / np.sqrt(64)
        out_f = flash_attention(q, k, v, scale=scale)
        out_r = ops.attend(q, k, v, scale=scale)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   rtol=1e-4, atol=1e-5)

    def test_padding_mask(self):
        q, k, v = make_qkv(b=2, s=64)
        mask = np.ones((2, 64), np.float32)
        mask[0, 40:] = 0
        mask[1, 10:] = 0
        scale = 0.125
        out_f = flash_attention(q, k, v, scale=scale, causal=True,
                                attention_mask=jnp.asarray(mask))
        out_r = ops.attend(q, k, v, scale=scale, causal=True,
                           attention_mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   rtol=1e-4, atol=1e-5)

    def test_fused_xpos_rotation(self):
        b, h, s, d = 2, 8, 128, 96
        rng = np.random.RandomState(3)
        q, k, v = (jnp.asarray(rng.randn(b, h, s, d).astype(np.float32) * 0.5)
                   for _ in range(3))
        freqs = ops.lang_freqs(48)
        scale = 1.0 / np.sqrt(d * h)
        out_f = flash_attention(q, k, v, scale=scale, causal=True,
                                rope_freqs=freqs, xpos=True)
        qr, kr = ops.rotate_queries_and_keys(q, k, freqs, rot_dim=48)
        out_r = ops.attend(qr, kr, v, scale=scale, causal=True)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   rtol=1e-4, atol=1e-5)

    def test_fused_pixel_rotation(self):
        b, h, s, d = 2, 8, 196, 96
        rng = np.random.RandomState(4)
        q, k, v = (jnp.asarray(rng.randn(b, h, s, d).astype(np.float32) * 0.5)
                   for _ in range(3))
        freqs = ops.pixel_freqs(48)
        scale = 1.0 / np.sqrt(d)
        out_f = flash_attention(q, k, v, scale=scale, rope_freqs=freqs)
        qr = ops.rotate_queries_or_keys(q, freqs)
        kr = ops.rotate_queries_or_keys(k, freqs)
        out_r = ops.attend(qr, kr, v, scale=scale)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   rtol=1e-4, atol=1e-5)

    def test_gradients_match_xla(self):
        b, h, s, d = 2, 4, 64, 32
        rng = np.random.RandomState(5)
        q, k, v = (jnp.asarray(rng.randn(b, h, s, d).astype(np.float32) * 0.5)
                   for _ in range(3))
        freqs = ops.lang_freqs(32)
        scale = 1.0 / np.sqrt(d * h)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, scale=scale, causal=True,
                                           rope_freqs=freqs, xpos=True) ** 2)

        def loss_ref(q, k, v):
            qr, kr = ops.rotate_queries_and_keys(q, k, freqs, rot_dim=32)
            return jnp.sum(ops.attend(qr, kr, v, scale=scale,
                                      causal=True) ** 2)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-3, atol=1e-4)

    def test_bf16_inputs(self):
        q, k, v = make_qkv(s=64)
        q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
        out = flash_attention(q, k, v, scale=0.125)
        assert out.dtype == jnp.bfloat16
        ref = ops.attend(q, k, v, scale=0.125)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)

    def test_bf16_wholeq_bwd_matches_multiblock(self):
        # The whole-q resident backward (single q-block) writes dk/dv once,
        # so it emits them in the input dtype directly; multi-block grids
        # accumulate across q-block revisits in fp32 output refs. The two
        # regimes must agree on bf16 inputs (same in-block fp32 math, the
        # only difference is where the final bf16 rounding happens).
        from meant_tpu.ops.flash.kernel import flash_mha
        q, k, v = make_qkv(b=2, h=2, s=64, d=32, seed=21)
        q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
        scale = 1.0 / np.sqrt(32)

        def loss(q, k, v, bq):
            o = flash_mha(q, k, v, scale=scale, causal=True, block_q=bq)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        g_whole = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, 64)
        g_multi = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, 16)
        for a, b_ in zip(g_whole, g_multi):
            assert a.dtype == jnp.bfloat16
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b_, np.float32),
                rtol=2e-2, atol=2e-2)


class TestOnlineSoftmaxKernel:
    """k-blocked streaming forward (online softmax) — exercised with small
    block_k so the accumulation crosses many k blocks."""

    def test_online_matches_resident(self):
        from meant_tpu.ops.flash.kernel import flash_mha
        rng = np.random.RandomState(10)
        b, h, s, d = 2, 4, 256, 64
        q, k, v = (jnp.asarray(rng.randn(b, h, s, d).astype(np.float32) * 0.5)
                   for _ in range(3))
        scale = 1.0 / np.sqrt(d)
        ref = flash_mha(q, k, v, scale=scale, causal=True,
                        force_online=False)
        out = flash_mha(q, k, v, scale=scale, causal=True,
                        force_online=True, block_k=64)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_online_with_rotation_and_mask(self):
        from meant_tpu.ops.flash.kernel import flash_mha
        from meant_tpu.ops.flash.flash_attention import _tables
        rng = np.random.RandomState(11)
        b, h, s, d = 2, 2, 192, 96
        q, k, v = (jnp.asarray(rng.randn(b, h, s, d).astype(np.float32) * 0.5)
                   for _ in range(3))
        freqs = ops.lang_freqs(48)
        qcos, qsin, kcos, ksin = _tables(s, d, freqs, xpos=True,
                                         scale_base=512.0)
        mask = np.ones((b, s), np.float32)
        mask[0, 150:] = 0
        scale = 1.0 / np.sqrt(d * h)
        args = dict(scale=scale, causal=True,
                    attention_mask=jnp.asarray(mask),
                    qcos=qcos, qsin=qsin, kcos=kcos, ksin=ksin)
        ref = flash_mha(q, k, v, force_online=False, **args)
        out = flash_mha(q, k, v, force_online=True, block_k=64, **args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


class TestStreamingBackward:
    """k-blocked streaming backward (FlashAttention-2 style: LSE from the
    forward, delta in XLA, dQ streams k blocks / dK,dV stream q blocks) vs
    the XLA VJP of the identical math. Small blocks force many
    accumulation crossings; s=512 with block 64 exercises an 8x8 block
    grid including causal skipping on both kernels."""

    def _grads(self, q, k, v, fn):
        return jax.grad(lambda q_, k_, v_: jnp.sum(fn(q_, k_, v_) ** 2),
                        argnums=(0, 1, 2))(q, k, v)

    @pytest.mark.parametrize("causal", [False, True])
    def test_streaming_grads_match_xla(self, causal):
        from meant_tpu.ops.flash.kernel import flash_mha
        b, h, s, d = 1, 2, 512, 64
        rng = np.random.RandomState(20)
        q, k, v = (jnp.asarray(rng.randn(b, h, s, d).astype(np.float32) * .5)
                   for _ in range(3))
        scale = 1.0 / np.sqrt(d)

        def fl(q_, k_, v_):
            return flash_mha(q_, k_, v_, scale=scale, causal=causal,
                             force_online=True, block_q=64, block_k=64)

        def ref(q_, k_, v_):
            return ops.attend(q_, k_, v_, scale=scale, causal=causal)

        gf = self._grads(q, k, v, fl)
        gr = self._grads(q, k, v, ref)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-3, atol=1e-4)

    def test_streaming_grads_rotation_and_mask(self):
        from meant_tpu.ops.flash.kernel import flash_mha
        from meant_tpu.ops.flash.flash_attention import _tables
        b, h, s, d = 1, 2, 256, 64
        rng = np.random.RandomState(21)
        q, k, v = (jnp.asarray(rng.randn(b, h, s, d).astype(np.float32) * .5)
                   for _ in range(3))
        freqs = ops.lang_freqs(32)
        qcos, qsin, kcos, ksin = _tables(s, d, freqs, xpos=True,
                                         scale_base=512.0)
        mask = np.ones((b, s), np.float32)
        mask[0, 200:] = 0
        scale = 1.0 / np.sqrt(d * h)
        args = dict(scale=scale, causal=True,
                    attention_mask=jnp.asarray(mask),
                    qcos=qcos, qsin=qsin, kcos=kcos, ksin=ksin)

        def fl(q_, k_, v_):
            return flash_mha(q_, k_, v_, force_online=True, block_q=64,
                             block_k=64, **args)

        def ref(q_, k_, v_):
            qr, kr = ops.rotate_queries_and_keys(q_, k_, freqs, rot_dim=32)
            return ops.attend(qr, kr, v_, scale=scale, causal=True,
                              attention_mask=jnp.asarray(mask))

        gf = self._grads(q, k, v, fl)
        gr = self._grads(q, k, v, ref)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-3, atol=1e-4)

    def test_streaming_grads_long_seq(self):
        # s = 2048 with the default dispatch threshold overridden — the
        # regime the streaming bwd exists for (s_k beyond VMEM residency).
        from meant_tpu.ops.flash.kernel import flash_mha
        b, h, s, d = 1, 1, 2048, 32
        rng = np.random.RandomState(22)
        q, k, v = (jnp.asarray(rng.randn(b, h, s, d).astype(np.float32) * .5)
                   for _ in range(3))
        scale = 1.0 / np.sqrt(d)

        def fl(q_, k_, v_):
            return flash_mha(q_, k_, v_, scale=scale, causal=True,
                             force_online=True, block_q=256, block_k=256)

        def ref(q_, k_, v_):
            return ops.attend(q_, k_, v_, scale=scale, causal=True)

        gf = self._grads(q, k, v, fl)
        gr = self._grads(q, k, v, ref)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-3, atol=1e-4)

    def test_streaming_bwd_non_multiple_block(self):
        from meant_tpu.ops.flash.kernel import flash_mha
        b, h, s, d = 1, 2, 196, 64
        rng = np.random.RandomState(23)
        q, k, v = (jnp.asarray(rng.randn(b, h, s, d).astype(np.float32) * .5)
                   for _ in range(3))
        scale = 1.0 / np.sqrt(d)

        def fl(q_, k_, v_):
            return flash_mha(q_, k_, v_, scale=scale, force_online=True,
                             block_q=64, block_k=64)

        def ref(q_, k_, v_):
            return ops.attend(q_, k_, v_, scale=scale)

        gf = self._grads(q, k, v, fl)
        gr = self._grads(q, k, v, ref)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-3, atol=1e-4)


class TestKernelRobustness:
    def test_cross_attention_sq_ne_sk(self):
        # s_q != s_k (cross-attention shape) through both paths
        from meant_tpu.ops.flash.kernel import flash_mha
        rng = np.random.RandomState(30)
        b, h, d = 2, 2, 32
        q = jnp.asarray(rng.randn(b, h, 48, d).astype(np.float32) * .5)
        k = jnp.asarray(rng.randn(b, h, 160, d).astype(np.float32) * .5)
        v = jnp.asarray(rng.randn(b, h, 160, d).astype(np.float32) * .5)
        scale = 1.0 / np.sqrt(d)
        ref = ops.attend(q, k, v, scale=scale)
        for online in (False, True):
            out = flash_mha(q, k, v, scale=scale, force_online=online,
                            block_q=32, block_k=64)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("causal,dtype", [
        (False, jnp.float32), (True, jnp.float32), (False, jnp.bfloat16)])
    def test_direct_streaming_bwd_non_divisible_sk(self, causal, dtype):
        # DIRECT _flash_fwd_online/_flash_bwd_online call at s % block
        # != 0 — the scenario flash_mha's outside-the-kernel padding never
        # produces, but the module docstring promises defensive in-kernel
        # containment for. Out-of-bounds block content is undefined
        # (NaN-filled in interpret mode), and 0 * NaN = NaN escapes through
        # every contraction touching padded rows as CONTENT (p @ v,
        # ds @ kr, p^T @ do, ds^T @ qr) unless the kernels zero it at the
        # source — masking p/ds alone regressed to all-NaN dq here.
        from meant_tpu.ops.flash import kernel as fk
        rng = np.random.RandomState(33)
        bh, s, d = 4, 320, 32    # 320 % 128 = 64
        q, k, v, do = (jnp.asarray(
            rng.randn(bh, s, d).astype(np.float32) * .5).astype(dtype)
            for _ in range(4))
        ident_c = jnp.ones((s, d), jnp.float32)
        ident_s = jnp.zeros((s, d), jnp.float32)
        common = dict(scale=1.0 / np.sqrt(d), causal=causal, num_heads=2,
                      block_q=128, block_k=128, interpret=True)

        out, lse = fk._flash_fwd_online(q, k, v, None, ident_c, ident_s,
                                        ident_c, ident_s, **common)
        assert np.isfinite(np.asarray(out, np.float32)).all(), \
            "forward out not finite"
        delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                        axis=-1, keepdims=True)
        dq, dk, dv = fk._flash_bwd_online(
            q, k, v, do, lse.reshape(bh, s, 1), delta, None, ident_c,
            ident_s, ident_c, ident_s, **common)

        def ref(q_, k_, v_):
            sc = jnp.einsum("bqd,bkd->bqk", q_.astype(jnp.float32),
                            k_.astype(jnp.float32)) / np.sqrt(d)
            if causal:
                i = np.arange(s)
                sc = jnp.where(i[None, :, None] >= i[None, None, :],
                               sc, -jnp.inf)
            p = jax.nn.softmax(sc, axis=-1)
            o = jnp.einsum("bqk,bkd->bqd", p, v_.astype(jnp.float32))
            return jnp.sum(o * do.astype(jnp.float32))

        gr = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
        tol = dict(rtol=1e-3, atol=1e-4) if dtype == jnp.float32 \
            else dict(rtol=5e-2, atol=5e-2)
        for name, a, c in zip(("dq", "dk", "dv"), (dq, dk, dv), gr):
            a = np.asarray(a, np.float32)
            assert np.isfinite(a).all(), f"{name} not finite"
            np.testing.assert_allclose(a, np.asarray(c), err_msg=name,
                                       **tol)

    def test_direct_resident_bwd_non_divisible_sq(self):
        # DIRECT _flash_bwd (resident, q-blocked) at s_q % block_q != 0:
        # K/V load at exact size, but a padded q block row would poison
        # every dv row through p^T @ do unless the kernel zeroes qr/do.
        from meant_tpu.ops.flash import kernel as fk
        rng = np.random.RandomState(34)
        bh, s, d = 4, 192, 32    # 192 % 128 = 64
        q, k, v, do = (jnp.asarray(
            rng.randn(bh, s, d).astype(np.float32) * .5) for _ in range(4))
        ident_c = jnp.ones((s, d), jnp.float32)
        ident_s = jnp.zeros((s, d), jnp.float32)

        dq, dk, dv = fk._flash_bwd(
            q, k, v, do, None, ident_c, ident_s, ident_c, ident_s,
            scale=1.0 / np.sqrt(d), causal=False, num_heads=2,
            block_q=128, interpret=True)

        def ref(q_, k_, v_):
            p = jax.nn.softmax(
                jnp.einsum("bqd,bkd->bqk", q_, k_) / np.sqrt(d), axis=-1)
            return jnp.sum(jnp.einsum("bqk,bkd->bqd", p, v_) * do)

        gr = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, c in zip(("dq", "dk", "dv"), (dq, dk, dv), gr):
            a = np.asarray(a, np.float32)
            assert np.isfinite(a).all(), f"{name} not finite"
            np.testing.assert_allclose(a, np.asarray(c), rtol=1e-3,
                                       atol=1e-4, err_msg=name)

    def test_streaming_bwd_bf16(self):
        from meant_tpu.ops.flash.kernel import flash_mha
        rng = np.random.RandomState(31)
        b, h, s, d = 1, 2, 256, 32
        q, k, v = (jnp.asarray(
            rng.randn(b, h, s, d).astype(np.float32) * .5).astype(
                jnp.bfloat16) for _ in range(3))
        scale = 1.0 / np.sqrt(d)

        def fl(q_):
            return jnp.sum(flash_mha(q_, k, v, scale=scale, causal=True,
                                     force_online=True, block_q=64,
                                     block_k=64).astype(jnp.float32) ** 2)

        def ref(q_):
            return jnp.sum(ops.attend(q_, k, v, scale=scale,
                                      causal=True).astype(jnp.float32) ** 2)

        gf = jax.grad(fl)(q)
        gr = jax.grad(ref)(q)
        np.testing.assert_allclose(np.asarray(gf, np.float32),
                                   np.asarray(gr, np.float32),
                                   rtol=5e-2, atol=5e-2)

    def test_fully_masked_batch_row(self):
        # one batch element entirely masked out: no NaNs either path
        from meant_tpu.ops.flash.kernel import flash_mha
        rng = np.random.RandomState(32)
        b, h, s, d = 2, 2, 64, 32
        q, k, v = (jnp.asarray(rng.randn(b, h, s, d).astype(np.float32))
                   for _ in range(3))
        mask = np.ones((b, s), np.float32)
        mask[1] = 0.0
        for online in (False, True):
            out = flash_mha(q, k, v, scale=0.2, causal=False,
                            attention_mask=jnp.asarray(mask),
                            force_online=online, block_k=32)
            assert np.isfinite(np.asarray(out)).all()
