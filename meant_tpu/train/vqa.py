"""VQA trainer — rebuild of `vqa_trainer` (`vqa.py:88-293`).

Loss: CrossEntropy against SOFT targets (the VQA-v2 min(1, count/3) scores,
`vqa_manual.py:18-60`): -sum(target * log_softmax(out)) averaged over the
batch (torch CrossEntropyLoss with probabilistic targets).

Metric quirk preserved in spirit: the reference shifts outputs by
`abs(min(out))` before the torchmetrics update (`vqa.py:223,251`) because its
metrics reject negatives — irrelevant here since the confusion matrix uses
argmax (shift-invariant); targets enter as argmax of the soft scores.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp
from flax.training import train_state

from meant_tpu.parallel import make_mesh, replicated, shard_batch
from meant_tpu.train import checkpoint as ckpt
from meant_tpu.train.optim import build_optimizer
from meant_tpu.utils.metrics import F1Metrics, confusion_delta


def soft_target_ce(out: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(targets.astype(jnp.float32) * logp, axis=-1))


class vqa_trainer:
    """params keys mirror `vqa.py:88-163`: model, model_name, train/val/test
    loaders (batches with language_input_ids, pixel_values, attention_mask,
    pixel_mask, labels[soft]), epochs, num_classes, optimizer config,
    early_stopping, test_model, file_path, run_id, num_encoders, mesh."""

    def __init__(self, p: Dict[str, Any]):
        self.model = p["model"]
        self.model_name = p.get("model_name", "meant_vqa")
        self.dataset = p.get("dataset", "vqa")
        self.train_loader = p["train_loader"]
        self.val_loader = p.get("val_loader")
        self.test_loader = p.get("test_loader")
        self.num_epochs = p.get("epochs", 1)
        self.num_classes = p["num_classes"]
        self.file_path = p.get("file_path", ".")
        self.run_id = str(p.get("run_id", "0"))
        self.num_encoders = p.get("num_encoders", 1)
        self.early_stopping = p.get("early_stopping", False)
        self.test_model = p.get("test_model", True)
        self.seed = p.get("seed", 0)
        self.mesh = p.get("mesh") or make_mesh()
        # FSDP/ZeRO-3 (parallel/fsdp.py), same semantics as meant_trainer
        self.fsdp = p.get("fsdp", False)
        self._state_sharding = None
        self._opt_kwargs = dict(
            optimizer=p.get("optimizer", "AdamW"),
            learning_rate=p.get("lr", 5e-5), decay=p.get("decay", 0.0),
            beta_1=p.get("beta_1", 0.9), beta_2=p.get("beta_2", 0.999),
            lr_scheduler=p.get("lrst", "cosine_warm"), t0=p.get("t0", 7),
            tmax=p.get("tmax", 10),
            steps_per_epoch=max(len(self.train_loader), 1))
        # optional pretrained graft: keys present override the fresh init
        # (the reference's pretrained-load workflow, `vqa.py:320-327`)
        self.init_params = p.get("init_params")
        self.state = None
        self._jit_train = None
        self._jit_eval = None
        self.history = []

    def _forward_args(self, batch):
        return (batch["language_input_ids"], batch["pixel_values"]), \
               {"attention_mask": batch.get("attention_mask")}

    def _init_state(self, batch):
        rng = jax.random.PRNGKey(self.seed)
        args, kwargs = self._forward_args(batch)
        variables = self.model.init(
            {"params": rng, "dropout": rng},
            *(jnp.asarray(a) for a in args),
            **{k: (jnp.asarray(v) if v is not None else None)
               for k, v in kwargs.items()})
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
        model = self.model
        num_classes = self.num_classes
        seed = self.seed
        fargs = self._forward_args

        def train_step(state, batch):
            rng = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
            targets = batch["labels"]

            def loss_fn(params):
                args, kwargs = fargs(batch)
                out = model.apply({"params": params}, *args, **kwargs,
                                  deterministic=False,
                                  rngs={"dropout": rng})
                return soft_target_ce(out, targets), out

            (loss, out), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads)
            cm = confusion_delta(out, jnp.argmax(targets, axis=-1),
                                 num_classes)
            return state, loss, cm

        def eval_step(state, batch):
            args, kwargs = fargs(batch)
            out = model.apply({"params": state.params}, *args, **kwargs,
                              deterministic=True)
            loss = soft_target_ce(out, batch["labels"])
            cm = confusion_delta(out, jnp.argmax(batch["labels"], axis=-1),
                                 num_classes)
            return loss, cm

        rep = replicated(self.mesh)
        state_sh = self._state_sharding if self._state_sharding is not None \
            else rep
        self._jit_train = jax.jit(train_step, donate_argnums=(0,),
                                  out_shardings=(state_sh, rep, rep))
        self._jit_eval = jax.jit(eval_step, out_shardings=(rep, rep))

    def _device_batch(self, batch):
        db = {k: jnp.asarray(v) for k, v in batch.items()}
        db["language_input_ids"] = db["language_input_ids"].astype(jnp.int32)
        return shard_batch(db, self.mesh)

    def train(self):
        first = next(iter(self.train_loader))
        if self.state is None:
            self._init_state(first)
        self._build_steps()
        prev_f1 = float("inf")
        patience, lost_patience = 0, 5
        final_epoch = 0
        for ep in range(self.num_epochs):
            final_epoch = ep
            t0 = time.time()
            metrics = F1Metrics(self.num_classes, "train")
            losses = []
            for batch in self.train_loader:
                db = self._device_batch(batch)
                self.state, loss, cm = self._jit_train(self.state, db)
                metrics.update_cm(cm)
                losses.append(loss)
            train_loss = float(jnp.mean(jnp.stack(losses)))
            print("length: ", str(time.time() - t0))
            metrics.show()
            rec = {"epoch": ep, "train_loss": train_loss}
            if self.val_loader is not None:
                vm = F1Metrics(self.num_classes, "validation")
                for batch in self.val_loader:
                    db = self._device_batch(batch)
                    loss, cm = self._jit_eval(self.state, db)
                    vm.update_cm(cm)
                val_f1_macro, _ = vm.show()
                rec["val_f1_macro"] = val_f1_macro
                if self.early_stopping:
                    if val_f1_macro <= prev_f1:
                        patience += 1
                        if patience == lost_patience:
                            print("Stopped at epoch " + str(ep))
                            self.history.append(rec)
                            break
                    else:
                        patience = 0
                    prev_f1 = val_f1_macro
            self.history.append(rec)

        name = ckpt.checkpoint_name(self.model_name, self.num_encoders,
                                    self.dataset, self.run_id,
                                    final_epoch + 1)
        path = os.path.join(self.file_path, "models", self.model_name, name)
        try:
            ckpt.save(path, {"params": self.state.params,
                             "step": int(self.state.step)})
        except Exception as e:
            print(f"Your filepath is invalid. Save has failed: {e}")

        results = {"history": self.history}
        if self.test_model and self.test_loader is not None:
            print("Testing...")
            tm = F1Metrics(self.num_classes, "test")
            for batch in self.test_loader:
                db = self._device_batch(batch)
                loss, cm = self._jit_eval(self.state, db)
                tm.update_cm(cm)
            tm.show()
            results["test"] = tm.compute()
        return results
