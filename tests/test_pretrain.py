"""MLM / MIM pretraining: masking semantics + end-to-end loss decrease."""

import numpy as np

import jax
import jax.numpy as jnp

from meant_tpu.data import ArrayLoader
from meant_tpu.data.masking import (IGNORE_INDEX, mask_image, mask_tokens,
                                    shift_labels_clm)
from meant_tpu.models.meant import EmbeddingConfig
from meant_tpu.models.pretrainers import (meant_language_pretrainer,
                                          meant_vision_pretrainer,
                                          pixel_shuffle)
from meant_tpu.train.pretrain import (mim_l1_loss, mim_pretrainer, mlm_loss,
                                      mlm_pretrainer)

TINY_EMB = EmbeddingConfig(vocab_size=64, hidden_size=32,
                           max_position_embeddings=40, dropout=0.0)


class TestMasking:
    def test_mask_tokens(self):
        ids = np.random.RandomState(0).randint(4, 60, size=(8, 16))
        ids[:, 0] = 0  # special
        inputs, labels = mask_tokens(ids, mask_token_id=63,
                                     special_ids=[0, 1, 2], seed=1)
        masked = inputs == 63
        assert masked.any()
        assert not masked[:, 0].any()  # special tokens protected
        # labels carry original ids at masked positions, -100 elsewhere
        assert (labels[masked] == ids[masked]).all()
        assert (labels[~masked] == IGNORE_INDEX).all()

    def test_clm_shift(self):
        ids = np.arange(12).reshape(2, 6)
        labels = shift_labels_clm(ids)
        assert (labels[:, :-1] == ids[:, 1:]).all()
        assert (labels[:, -1] == IGNORE_INDEX).all()

    def test_mask_image(self):
        img = np.random.RandomState(0).rand(2, 4, 8, 8).astype(np.float32)
        inputs, labels = mask_image(img, mask_probability=0.3, seed=2)
        masked = inputs != img
        assert masked.any()
        assert (labels[~masked] == IGNORE_INDEX).all()
        assert np.allclose(labels[masked], img[masked])


class TestPixelShuffle:
    def test_matches_torch(self):
        import torch
        x = np.random.RandomState(0).randn(2, 3 * 4, 2, 2).astype(np.float32)
        out_j = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
        out_t = torch.pixel_shuffle(torch.tensor(x), 2).numpy()
        np.testing.assert_allclose(out_j, out_t)


class TestLosses:
    def test_mim_loss_matches_torch_l1_on_markers(self):
        """DEFECTS #30: the reference MIM loss is plain nn.L1Loss against
        labels that still carry -100 at unmasked pixels. Default replicates
        it bit-for-bit; masked_only=True is the repair (masked pixels
        only)."""
        import torch
        rng = np.random.RandomState(3)
        imgs = rng.rand(2, 4, 8, 8).astype(np.float32)
        _, labels = mask_image(imgs, mask_probability=0.3, seed=4)
        pred = rng.randn(2, 3, 8, 8).astype(np.float32)
        faithful = float(mim_l1_loss(jnp.asarray(pred), jnp.asarray(labels)))
        lt = float(torch.nn.L1Loss()(torch.tensor(pred),
                                     torch.tensor(labels[:, 0:3])))
        # fp32 reduction-order noise at magnitude ~70 => relative check
        assert abs(faithful - lt) / lt < 1e-6
        # the faithful loss is dominated by the ~|pred+100| marker term
        assert faithful > 50.0
        repaired = float(mim_l1_loss(jnp.asarray(pred), jnp.asarray(labels),
                                     masked_only=True))
        target = labels[:, 0:3]
        valid = target != IGNORE_INDEX
        want = np.abs(pred - target)[valid].sum() / valid.sum()
        assert abs(repaired - want) < 1e-6

    def test_mlm_loss_vs_torch(self):
        import torch
        rng = np.random.RandomState(0)
        logits = rng.randn(4, 6, 10).astype(np.float32)
        labels = rng.randint(0, 10, size=(4, 6))
        labels[:, ::2] = IGNORE_INDEX
        lj = float(mlm_loss(jnp.asarray(logits), jnp.asarray(labels)))
        lt = float(torch.nn.functional.cross_entropy(
            torch.tensor(logits).view(-1, 10), torch.tensor(labels).view(-1),
            ignore_index=IGNORE_INDEX))
        assert abs(lj - lt) < 1e-5


class TestEndToEnd:
    def test_mlm_pretraining_loss_decreases(self, tmp_path):
        rng = np.random.RandomState(0)
        n, s = 64, 16
        ids = rng.randint(4, 60, size=(n, s)).astype(np.int32)
        inputs, labels = mask_tokens(ids, mask_token_id=63,
                                     special_ids=[0, 1, 2], seed=1)
        data = {"input_ids": inputs.astype(np.int32),
                "labels": labels.astype(np.int32),
                "attention_mask": np.ones((n, s), np.float32)}
        model = meant_language_pretrainer(num_encoders=1, embedding=TINY_EMB,
                                          text_dim=32, num_heads=4)
        tr = mlm_pretrainer({
            "model": model, "model_name": "meant_language_pretrainer",
            "train_data": ArrayLoader(data, 16),
            "val_data": ArrayLoader(data, 16),
            "epochs": 3, "lr": 1e-3, "lrst": "constant",
            "file_path": str(tmp_path), "run_id": "7"})
        hist = tr.train()
        assert hist[-1]["train_loss"] < hist[0]["train_loss"]

    def test_mlm_gathered_head_is_exact(self, tmp_path):
        """gather_masked computes the vocab head at the masked positions
        only; CE's -100 ignore zeroes the logit cotangent at every other
        position, so loss AND gradients must match the full head exactly
        (fp32 CPU: to float tolerance)."""
        from meant_tpu.parallel import shard_batch
        rng = np.random.RandomState(1)
        n, s = 16, 16
        ids = rng.randint(4, 60, size=(n, s)).astype(np.int32)
        inputs, labels = mask_tokens(ids, mask_token_id=63,
                                     special_ids=[0, 1, 2], seed=2)
        data = {"input_ids": inputs.astype(np.int32),
                "labels": labels.astype(np.int32),
                "attention_mask": np.ones((n, s), np.float32)}
        model = meant_language_pretrainer(num_encoders=1, embedding=TINY_EMB,
                                          text_dim=32, num_heads=4)
        losses, params = [], []
        for gather in (False, True):
            tr = mlm_pretrainer({
                "model": model, "model_name": "meant_language_pretrainer",
                "train_data": ArrayLoader(data, 16), "epochs": 1,
                "lr": 1e-3, "lrst": "constant", "seed": 3,
                "file_path": str(tmp_path), "run_id": f"g{gather}",
                "gather_masked": gather})
            batch = next(iter(tr.train_data))
            tr._init_state(batch)
            tr._build_steps()
            db = shard_batch(jax.tree.map(jnp.asarray, dict(batch)), tr.mesh)
            state, loss = tr._jit_train(tr.state, db)
            losses.append(float(loss))
            params.append(jax.tree.map(np.asarray, state.params))
        assert abs(losses[0] - losses[1]) < 1e-6
        flatA = jax.tree_util.tree_leaves_with_path(params[0])
        flatB = jax.tree_util.tree_leaves(params[1])
        for (path, a), b in zip(flatA, flatB):
            np.testing.assert_allclose(
                a, b, atol=2e-6, rtol=1e-5,
                err_msg=jax.tree_util.keystr(path))

    def test_masked_positions_overflow_poisons_loss(self):
        from meant_tpu.train.pretrain import (default_gather_capacity,
                                              masked_positions, mlm_loss)
        assert default_gather_capacity(128) == 48
        assert default_gather_capacity(16) == 8
        labels = np.full((2, 16), 5, np.int32)   # ALL positions masked
        pos, sel, overflow = masked_positions(jnp.asarray(labels), 8)
        assert bool(overflow)
        labels[:, 8:] = IGNORE_INDEX             # exactly at capacity
        pos, sel, overflow = masked_positions(jnp.asarray(labels), 8)
        assert not bool(overflow)
        assert np.all(np.asarray(sel) == 5)

    def test_mim_pretraining_runs(self, tmp_path):
        rng = np.random.RandomState(0)
        n = 16
        imgs = rng.rand(n, 4, 32, 32).astype(np.float32)
        inputs, labels = mask_image(imgs, seed=3)
        data = {"input_ids": inputs, "labels": labels}
        model = meant_vision_pretrainer(num_encoders=1, patch_res=16,
                                        channels=4, height=32, width=32,
                                        image_dim=32, num_heads=4)
        tr = mim_pretrainer({
            "model": model, "model_name": "meant_vision_pretrainer",
            "train_data": ArrayLoader(data, 8),
            "epochs": 2, "lr": 1e-3, "lrst": "constant",
            "file_path": str(tmp_path), "run_id": "8"})
        hist = tr.train()
        assert np.isfinite(hist[-1]["train_loss"])
        assert hist[-1]["train_loss"] < hist[0]["train_loss"]
