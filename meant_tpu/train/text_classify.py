"""Generic text-classification trainer — rebuild of `trainer/trainer.py`
(CustomTrainer: BCE loss over sigmoid heads, per-forward latency probes via
CUDA events `trainer/trainer.py:160-166`) and the `src/hug` tweet_eval-style
fine-tunes (`src/hug/tweet7.py`).

TPU: latency probes are wall-clock around a value-fetch barrier (device
timelines come from utils.observability.profile_trace); loss is BCE (the
reference's choice there) or CE, both against sigmoid/probability outputs.
"""

from __future__ import annotations

import time
from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp
from flax.training import train_state

from meant_tpu.parallel import make_mesh, replicated, shard_batch
from meant_tpu.train.optim import build_optimizer
from meant_tpu.utils.metrics import F1Metrics, confusion_delta


def bce_loss(out: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """torch nn.BCELoss on probability outputs vs one-hot labels."""
    out = jnp.clip(out.astype(jnp.float32), 1e-7, 1 - 1e-7)
    onehot = jax.nn.one_hot(labels, out.shape[-1], dtype=jnp.float32)
    return -jnp.mean(onehot * jnp.log(out) + (1 - onehot) * jnp.log(1 - out))


class text_classifier_trainer:
    """Batches: tweets/input_ids (b, s), optional attention mask, y."""

    def __init__(self, p: Dict[str, Any]):
        self.model = p["model"]
        self.loader = p["train_loader"]
        self.val_loader = p.get("val_loader")
        self.num_classes = p.get("num_classes", 2)
        self.num_epochs = p.get("epochs", 1)
        self.loss_name = p.get("loss", "Binary Cross Entropy")
        self.seed = p.get("seed", 0)
        self.mesh = p.get("mesh") or make_mesh()
        # FSDP/ZeRO-3 (parallel/fsdp.py), same semantics as meant_trainer
        self.fsdp = p.get("fsdp", False)
        self._state_sharding = None
        self._opt_kwargs = dict(
            optimizer=p.get("optimizer", "AdamW"),
            learning_rate=p.get("lr", 5e-5), decay=p.get("decay", 0.0),
            lr_scheduler=p.get("lrst", "constant"),
            steps_per_epoch=max(len(self.loader), 1))
        self.state = None
        self.latencies = []
        self.history = []

    def _loss(self, out, labels):
        if self.loss_name == "Binary Cross Entropy":
            return bce_loss(out, labels)
        from meant_tpu.train.classify import sigmoid_ce_loss
        return sigmoid_ce_loss(out, labels)

    def _setup(self, batch):
        rng = jax.random.PRNGKey(self.seed)
        variables = self.model.init({"params": rng, "dropout": rng},
                                    jnp.asarray(batch["input_ids"]))
        tx = build_optimizer(variables["params"], **self._opt_kwargs)
        state = train_state.TrainState.create(
            apply_fn=self.model.apply, params=variables["params"], tx=tx)
        if self.fsdp:
            from meant_tpu.parallel import fsdp_shard
            self.state, self._state_sharding = fsdp_shard(state, self.mesh)
        else:
            self._state_sharding = replicated(self.mesh)
            self.state = jax.device_put(state, self._state_sharding)

        def train_step(state, batch):
            rng2 = jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                      state.step)

            def loss_fn(params):
                out = self.model.apply({"params": params},
                                       batch["input_ids"],
                                       deterministic=False,
                                       rngs={"dropout": rng2})
                return self._loss(out, batch["y"]), out

            (loss, out), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads)
            return state, loss, confusion_delta(out, batch["y"],
                                                self.num_classes)

        rep = replicated(self.mesh)
        self._jit_train = jax.jit(train_step, donate_argnums=(0,),
                                  out_shardings=(self._state_sharding,
                                                 rep, rep))

    def train(self):
        first = next(iter(self.loader))
        if self.state is None:
            self._setup(first)
        for ep in range(self.num_epochs):
            metrics = F1Metrics(self.num_classes, "train")
            losses = []
            for batch in self.loader:
                db = shard_batch({k: jnp.asarray(v)
                                  for k, v in batch.items()}, self.mesh)
                t0 = time.perf_counter()
                self.state, loss, cm = self._jit_train(self.state, db)
                float(loss)  # value-fetch barrier: true per-step latency
                self.latencies.append(time.perf_counter() - t0)
                metrics.update_cm(cm)
                losses.append(float(loss))
            self.history.append({"epoch": ep,
                                 "train_loss": float(np.mean(losses)),
                                 **{f"train_{k}": v for k, v in
                                    metrics.compute().items()
                                    if not isinstance(v, list)}})
        return self.history
