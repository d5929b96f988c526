"""Numerical parity tests for the ops substrate against the torch oracle."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from meant_tpu import ops
import torch_ref as tr


def t2n(x):
    return x.detach().numpy()


class TestRotary:
    def test_lang_freqs(self):
        dim = 48
        np.testing.assert_allclose(np.asarray(ops.lang_freqs(dim)),
                                   t2n(tr.lang_freqs(dim)), rtol=1e-6)

    def test_pixel_freqs(self):
        dim = 48
        np.testing.assert_allclose(np.asarray(ops.pixel_freqs(dim)),
                                   t2n(tr.pixel_freqs(dim)), rtol=1e-6)

    def test_rotate_half(self):
        x = np.random.RandomState(0).randn(2, 3, 8).astype(np.float32)
        np.testing.assert_allclose(np.asarray(ops.rotate_half(jnp.array(x))),
                                   t2n(tr.rotate_half(torch.tensor(x))),
                                   rtol=1e-6)

    def test_plain_rope_partial_dim(self):
        # Vision case: head dim 96, rotary dim 48 (rotates first 48 features).
        # Freq tables are module data (the reference stores them as an
        # nn.Parameter) — inject the SAME fp32 table into both sides; the
        # in-graph fp32 angle math then matches to trig-implementation ulps.
        rng = np.random.RandomState(1)
        x = rng.randn(2, 8, 196, 96).astype(np.float32)
        freqs = t2n(tr.pixel_freqs(48))
        out_j = ops.rotate_queries_or_keys(jnp.array(x), jnp.array(freqs))
        ang_t = tr.angles_for(torch.arange(196), torch.tensor(freqs))
        out_t = tr.apply_rotary(torch.tensor(x), ang_t)
        np.testing.assert_allclose(np.asarray(out_j), t2n(out_t),
                                   rtol=1e-4, atol=1e-5)

    def test_xpos_rotation(self):
        # Language case: head dim 96, xPos RotaryEmbedding(dim=48) => rot_dim 48.
        rng = np.random.RandomState(2)
        q = rng.randn(2, 8, 128, 96).astype(np.float32)
        k = rng.randn(2, 8, 128, 96).astype(np.float32)
        freqs = t2n(tr.lang_freqs(48))
        qj, kj = ops.rotate_queries_and_keys(jnp.array(q), jnp.array(k),
                                             jnp.array(freqs), rot_dim=48)
        qt, kt = tr.rotate_qk(torch.tensor(q), torch.tensor(k),
                              torch.tensor(freqs), rot_dim=48)
        np.testing.assert_allclose(np.asarray(qj), t2n(qt), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(kj), t2n(kt), rtol=1e-4, atol=1e-5)

    def test_xpos_scale_block_layout(self):
        # The xPos scale is concatenated block-wise, not interleaved.
        s = np.asarray(ops.xpos_scale(8, jnp.arange(4)))
        assert s.shape == (4, 8)
        np.testing.assert_allclose(s[:, :4], s[:, 4:])
        np.testing.assert_allclose(s, t2n(tr.xpos_scale(8, torch.arange(4))),
                                   rtol=1e-6)

    def test_xpos_len1_is_identity(self):
        # src temporal quirk: q of length 1 => position 0 centered => identity.
        rng = np.random.RandomState(3)
        q = rng.randn(2, 8, 1, 96).astype(np.float32)
        k = rng.randn(2, 8, 5, 96).astype(np.float32)
        freqs = ops.lang_freqs(48)
        qj, kj = ops.rotate_queries_and_keys(jnp.array(q), jnp.array(k),
                                             freqs, rot_dim=48)
        np.testing.assert_allclose(np.asarray(qj), q, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(kj), k, rtol=1e-5, atol=1e-6)

    def test_axial_rotary_shapes(self):
        sin, cos = ops.axial_rotary_sincos(64, 14, 14)
        assert sin.shape == (196, 64) and cos.shape == (196, 64)

    def test_frame_rotary_block_layout(self):
        sin, cos = ops.frame_rotary_sincos(64, 5)
        assert sin.shape == (5, 64)
        # block layout: first half equals second half of the angle table
        np.testing.assert_allclose(np.asarray(sin[:, :32]),
                                   np.asarray(sin[:, 32:]))


class TestNorms:
    def test_rms_norm(self):
        rng = np.random.RandomState(4)
        x = rng.randn(2, 5, 64).astype(np.float32)
        scale = rng.randn(64).astype(np.float32)
        out_j = ops.rms_norm(jnp.array(x), jnp.array(scale))
        out_t = tr.rms_norm(torch.tensor(x), torch.tensor(scale))
        np.testing.assert_allclose(np.asarray(out_j), t2n(out_t),
                                   rtol=1e-4, atol=1e-5)

    def test_rms_norm_partial(self):
        rng = np.random.RandomState(5)
        x = rng.randn(3, 32).astype(np.float32)
        scale = np.ones(32, np.float32)
        out_j = ops.rms_norm(jnp.array(x), jnp.array(scale), p=0.5)
        out_t = tr.rms_norm(torch.tensor(x), torch.tensor(scale), p=0.5)
        np.testing.assert_allclose(np.asarray(out_j), t2n(out_t),
                                   rtol=1e-4, atol=1e-5)

    def test_layer_norm_matches_torch(self):
        rng = np.random.RandomState(6)
        x = rng.randn(2, 7, 48).astype(np.float32)
        g = rng.randn(48).astype(np.float32)
        b = rng.randn(48).astype(np.float32)
        out_j = ops.layer_norm(jnp.array(x), jnp.array(g), jnp.array(b))
        out_t = torch.nn.functional.layer_norm(
            torch.tensor(x), (48,), torch.tensor(g), torch.tensor(b))
        np.testing.assert_allclose(np.asarray(out_j), t2n(out_t),
                                   rtol=1e-4, atol=1e-5)


class TestAttention:
    @pytest.mark.parametrize("causal", [False, True])
    def test_attend_matches_torch(self, causal):
        rng = np.random.RandomState(7)
        b, h, s, d = 2, 4, 33, 16
        q = rng.randn(b, h, s, d).astype(np.float32)
        k = rng.randn(b, h, s, d).astype(np.float32)
        v = rng.randn(b, h, s, d).astype(np.float32)
        scale = 1.0 / np.sqrt(d * h)
        out_j = ops.attend(jnp.array(q), jnp.array(k), jnp.array(v),
                           scale=scale, causal=causal)
        out_t = tr.attention(torch.tensor(q), torch.tensor(k), torch.tensor(v),
                             scale, causal=causal)
        np.testing.assert_allclose(np.asarray(out_j), t2n(out_t),
                                   rtol=1e-4, atol=1e-5)

    def test_padding_mask(self):
        rng = np.random.RandomState(8)
        b, h, s, d = 2, 2, 16, 8
        q, k, v = (rng.randn(b, h, s, d).astype(np.float32) for _ in range(3))
        mask = np.ones((b, s), np.float32)
        mask[:, 10:] = 0.0
        out_j = ops.attend(jnp.array(q), jnp.array(k), jnp.array(v),
                           scale=0.25, attention_mask=jnp.array(mask))
        out_t = tr.attention(torch.tensor(q), torch.tensor(k), torch.tensor(v),
                             0.25, attention_mask=torch.tensor(mask))
        np.testing.assert_allclose(np.asarray(out_j), t2n(out_t),
                                   rtol=1e-4, atol=1e-5)
        # Masked keys must not influence the output.
        v2 = v.copy()
        v2[:, :, 10:, :] = 999.0
        out_j2 = ops.attend(jnp.array(q), jnp.array(k), jnp.array(v2),
                            scale=0.25, attention_mask=jnp.array(mask))
        np.testing.assert_allclose(np.asarray(out_j), np.asarray(out_j2),
                                   rtol=1e-5, atol=1e-5)

    def test_lag_attend_target_day_query(self):
        rng = np.random.RandomState(9)
        b, h, lag, d = 3, 8, 5, 32
        q = rng.randn(b, h, 1, d).astype(np.float32)
        k = rng.randn(b, h, lag, d).astype(np.float32)
        v = rng.randn(b, h, lag, d).astype(np.float32)
        scale = 1.0 / np.sqrt(d * h)
        out = ops.lag_attend(jnp.array(q), jnp.array(k), jnp.array(v),
                             scale=scale)
        assert out.shape == (b, h, 1, d)
        out_t = tr.attention(torch.tensor(q), torch.tensor(k),
                             torch.tensor(v), scale)
        np.testing.assert_allclose(np.asarray(out), t2n(out_t),
                                   rtol=1e-4, atol=1e-5)
