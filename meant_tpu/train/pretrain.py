"""MLM / MIM pretrainers — TPU-native rebuilds of `mlm_pretrainer`
(`pretrain_mlm.py:96-230`) and `mim_pretrainer` (`pretrain_mim.py:101-230`).

Semantics preserved: CE-over-vocab with -100 ignore for MLM; plain L1 on the
first 3 channels for MIM (`pretrain_mim.py:162,204` — the -100 markers are
INCLUDED as literal targets, DEFECTS #30; `masked_only=True` repairs);
grad-clip 1.0; per-epoch scheduler step; val-loss patience early exit; final
orbax checkpoint (params + optimizer state, the reference saves both).

TPU: single jitted step (donated state), batches sharded over the data mesh,
loss accumulated on device. The reference's nn.DataParallel branch
(`pretrain_mlm.py:329-330` — latently broken, SURVEY.md §2.6.12) maps to the
mesh instead.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp
from flax.training import train_state

from meant_tpu.data.masking import IGNORE_INDEX
from meant_tpu.parallel import make_mesh, replicated, shard_batch
from meant_tpu.train import checkpoint as ckpt
from meant_tpu.train.optim import build_optimizer


def mlm_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """CE over vocab, ignore_index=-100 (torch CrossEntropyLoss mean over
    non-ignored)."""
    vocab = logits.shape[-1]
    logits = logits.reshape(-1, vocab).astype(jnp.float32)
    labels = labels.reshape(-1)
    valid = labels != IGNORE_INDEX
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1).squeeze(-1)
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


def default_gather_capacity(seq_len: int) -> int:
    """Per-example masked-position capacity for the gathered MLM head:
    37.5% of the sequence, rounded up to a lane-friendly multiple of 8.
    Masking is Bernoulli(0.15) per eligible token (`data/masking.py`), so
    at s=128 the per-row count is mean 19.2, sd 4.0 — capacity 48 sits
    ~7 sigma out (overflow ~1e-12/row; a guard poisons the loss with NaN
    if it ever happens rather than silently dropping positions)."""
    return min(seq_len, max(8, ((int(seq_len * 3 // 8) + 7) // 8) * 8))


def masked_positions(labels: jnp.ndarray, capacity: int):
    """(b, s) MLM labels -> ((b, k) positions of the masked tokens padded
    with arbitrary valid indices, (b, k) gathered labels where padding
    rows carry -100 and thus contribute nothing, bool overflow flag)."""
    valid = labels != IGNORE_INDEX
    # stable argsort of the invalidity mask puts masked positions first,
    # in order; per-row, so a data-sharded batch stays batch-local
    order = jnp.argsort(jnp.logical_not(valid), axis=-1)
    pos = order[:, :capacity]
    sel = jnp.take_along_axis(labels, pos, axis=-1)
    overflow = jnp.any(jnp.sum(valid, axis=-1) > capacity)
    return pos, sel, overflow


def mim_l1_loss(pred: jnp.ndarray, labels: jnp.ndarray,
                masked_only: bool = False) -> jnp.ndarray:
    """Reference MIM loss (`pretrain_mim.py:162,204`): plain
    `nn.L1Loss()(out, labels[:, 0:3])`. The labels carry -100 at UNMASKED
    pixels (`utils/custom_datasets.py:124`) and L1Loss has NO ignore_index,
    so the shipped objective regresses ~85% of the reconstruction toward
    the -100 marker value (DEFECTS #30). Default replicates that observable
    behavior exactly; `masked_only=True` repairs it (L1 on the masked
    pixels only — the BEiT/SimMIM-style objective the code intends)."""
    target = labels[:, 0:3].astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    if not masked_only:
        return jnp.mean(jnp.abs(pred - target))
    valid = target != IGNORE_INDEX
    diff = jnp.abs(pred - jnp.where(valid, target, pred))
    return jnp.sum(diff) / jnp.maximum(jnp.sum(valid), 1)


class _BasePretrainer:
    kind = "mlm"

    def __init__(self, p: Dict[str, Any]):
        self.model = p["model"]
        self.model_name = p.get("model_name", self.kind)
        self.dataset = p.get("dataset", "pretrain")
        self.train_data = p["train_data"]
        self.val_data = p.get("val_data")
        self.num_epochs = p.get("epochs", 1)
        self.patience = p.get("patience", 3)
        self.file_path = p.get("file_path", ".")
        self.run_id = str(p.get("run_id", "0"))
        self.num_encoders = p.get("num_encoders", 1)
        self.seed = p.get("seed", 0)
        self.mesh = p.get("mesh") or make_mesh()
        self.track = p.get("track", False)
        # FSDP/ZeRO-3 params+moments sharding (parallel/fsdp.py), same
        # semantics as meant_trainer(fsdp=True)
        self.fsdp = p.get("fsdp", False)
        self._state_sharding = None
        self._opt_kwargs = dict(
            optimizer=p.get("optimizer", "AdamW"),
            learning_rate=p.get("lr", 5e-5), decay=p.get("decay", 0.0),
            beta_1=p.get("beta_1", 0.9), beta_2=p.get("beta_2", 0.999),
            lr_scheduler=p.get("lrst", "cosine_warm"),
            t0=p.get("t0", 7), tmax=p.get("tmax", 10),
            steps_per_epoch=max(len(self.train_data), 1),
            warmup_steps=p.get("warmup_steps", 0),
            total_steps=p.get("total_steps", 0),
            # MLM/MIM loops clip at 1.0 (`pretrain_mlm.py:188`); the hug
            # NER loop does NOT (ner_trainer defaults this to None)
            clip_norm=p.get("clip_norm", 1.0))
        # optional pretrained sub-tree graft: keys present in init_params
        # override the fresh init (the reference's pretrained-load /
        # encoder-graft workflow, `in_loop_train.py:496-507`)
        self.init_params = p.get("init_params")
        self.state = None
        self._jit_train = None
        self._jit_eval = None
        self.history = []

    def _apply(self, params, batch, deterministic, rng=None):
        raise NotImplementedError

    def _loss(self, out, batch):
        raise NotImplementedError

    def _init_state(self, batch):
        rng = jax.random.PRNGKey(self.seed)
        variables = self._init_variables(rng, batch)
        params = variables["params"]
        if self.init_params:
            params = dict(params)
            params.update(self.init_params)
        tx = build_optimizer(params, **self._opt_kwargs)
        state = train_state.TrainState.create(
            apply_fn=self.model.apply, params=params, tx=tx)
        if self.fsdp:
            from meant_tpu.parallel import fsdp_shard
            self.state, self._state_sharding = fsdp_shard(state, self.mesh)
        else:
            self._state_sharding = replicated(self.mesh)
            self.state = jax.device_put(state, self._state_sharding)

    def _build_steps(self):
        seed = self.seed

        def train_step(state, batch):
            rng = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)

            def loss_fn(params):
                out = self._apply(params, batch, False, rng)
                return self._loss(out, batch)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads=grads), loss

        def eval_step(state, batch):
            out = self._apply(state.params, batch, True)
            return self._loss(out, batch)

        rep = replicated(self.mesh)
        state_sh = self._state_sharding if self._state_sharding is not None \
            else rep
        self._jit_train = jax.jit(train_step, donate_argnums=(0,),
                                  out_shardings=(state_sh, rep))
        self._jit_eval = jax.jit(eval_step, out_shardings=rep)

    def train(self):
        first = next(iter(self.train_data))
        if self.state is None:
            self._init_state(first)
        self._build_steps()
        prev_val_loss = float("inf")
        lost_patience = 0
        final_epoch = 0
        for ep in range(self.num_epochs):
            final_epoch = ep
            t0 = time.time()
            losses = []
            for batch in self.train_data:
                db = shard_batch(jax.tree.map(jnp.asarray, dict(batch)),
                                 self.mesh)
                self.state, loss = self._jit_train(self.state, db)
                losses.append(loss)
            train_loss = float(jnp.mean(jnp.stack(losses)))
            print("epoch length:", str(time.time() - t0))
            rec = {"epoch": ep, "train_loss": train_loss}
            if self.val_data is not None:
                val_loss = 0.0
                for batch in self.val_data:
                    db = shard_batch(jax.tree.map(jnp.asarray, dict(batch)),
                                     self.mesh)
                    val_loss += float(self._jit_eval(self.state, db))
                rec["val_loss"] = val_loss
                self.history.append(rec)
                if val_loss >= prev_val_loss:
                    lost_patience += 1
                    if lost_patience > self.patience:
                        print("Model is not improving. "
                              "Exiting pretraining loop.")
                        break
                else:
                    prev_val_loss = val_loss
            else:
                self.history.append(rec)

        name = ckpt.checkpoint_name(self.model_name, self.num_encoders,
                                    self.dataset, self.run_id,
                                    final_epoch + 1)
        path = os.path.join(self.file_path, "models", self.model_name, name)
        try:
            ckpt.save(path, {"params": self.state.params,
                             "opt_state": self.state.opt_state,
                             "step": int(self.state.step)})
        except Exception as e:
            print(f"Save failed: {e}")
        return self.history


class mlm_pretrainer(_BasePretrainer):
    kind = "mlm"

    def __init__(self, p: Dict[str, Any]):
        super().__init__(p)
        # gather the masked positions BEFORE the vocab-64001 head — exact
        # math (see meant_language_pretrainer.positions), measured 1.46x
        # end-to-end on chip at b64 (905 -> 1322 samples/s); False = full
        # (b, s, vocab) logits, the reference's literal compute
        self.gather_masked = p.get("gather_masked", True)
        self.gather_capacity = p.get("gather_capacity")

    def _init_variables(self, rng, batch):
        return self.model.init({"params": rng, "dropout": rng},
                               jnp.asarray(batch["input_ids"]),
                               jnp.asarray(batch["attention_mask"]))

    def _apply(self, params, batch, deterministic, rng=None):
        rngs = {"dropout": rng} if rng is not None else None
        if self.gather_masked:
            cap = self.gather_capacity or default_gather_capacity(
                batch["labels"].shape[-1])
            pos, sel, overflow = masked_positions(batch["labels"], cap)
            logits = self.model.apply(
                {"params": params}, batch["input_ids"],
                batch["attention_mask"], deterministic=deterministic,
                positions=pos, rngs=rngs)
            return logits, sel, overflow
        return self.model.apply({"params": params}, batch["input_ids"],
                                batch["attention_mask"],
                                deterministic=deterministic, rngs=rngs)

    def _loss(self, out, batch):
        if self.gather_masked:
            logits, sel, overflow = out
            loss = mlm_loss(logits, sel)
            # capacity overflow would silently drop masked positions —
            # poison the loss instead so nan guards surface it
            return jnp.where(overflow, jnp.nan, loss)
        return mlm_loss(out, batch["labels"])


class mim_pretrainer(_BasePretrainer):
    kind = "mim"

    def __init__(self, p: Dict[str, Any]):
        super().__init__(p)
        # DEFECTS #30: default False = the reference's L1-on-markers loss;
        # True = masked-pixel-only repair
        self.masked_only = p.get("masked_only", False)

    def _init_variables(self, rng, batch):
        return self.model.init({"params": rng, "dropout": rng},
                               jnp.asarray(batch["input_ids"]))

    def _apply(self, params, batch, deterministic, rng=None):
        rngs = {"dropout": rng} if rng is not None else None
        return self.model.apply({"params": params}, batch["input_ids"],
                                deterministic=deterministic, rngs=rngs)

    def _loss(self, out, batch):
        return mim_l1_loss(out, batch["labels"],
                           masked_only=self.masked_only)
