"""Optimizer/schedule semantics vs torch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
import torch

from meant_tpu.train.optim import build_optimizer, epoch_schedule


def torch_schedule_factors(kind, epochs, t0=7, tmax=10):
    lin = torch.nn.Linear(2, 2)
    opt = torch.optim.AdamW(lin.parameters(), lr=1.0)
    if kind == "cosine_warm":
        sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(opt, t0)
    elif kind == "cosine":
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, tmax)
    elif kind == "linear":
        sched = torch.optim.lr_scheduler.LinearLR(opt)
    factors = []
    for _ in range(epochs):
        factors.append(opt.param_groups[0]["lr"])
        sched.step()
    return factors


@pytest.mark.parametrize("kind", ["cosine_warm", "cosine", "linear"])
def test_schedule_matches_torch(kind):
    epochs = 15
    sched = epoch_schedule(kind, 1.0, t0=7, tmax=10, steps_per_epoch=3)
    torch_vals = torch_schedule_factors(kind, epochs)
    for ep in range(epochs):
        mine = float(sched(jnp.asarray(ep * 3)))  # first step of the epoch
        # torch cosine uses a recursive formula; values match the closed form
        assert abs(mine - torch_vals[ep]) < 2e-3, (kind, ep, mine,
                                                   torch_vals[ep])


def test_adamw_matches_torch_one_step():
    rng = np.random.RandomState(0)
    w = rng.randn(4, 4).astype(np.float32)
    g = rng.randn(4, 4).astype(np.float32)

    params = {"lin": {"dense": {"kernel": jnp.asarray(w)}}}
    grads = {"lin": {"dense": {"kernel": jnp.asarray(g)}}}
    tx = build_optimizer(params, optimizer="AdamW", learning_rate=1e-3,
                         decay=0.01, lr_scheduler="constant",
                         clip_norm=None)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)

    wt = torch.nn.Parameter(torch.tensor(w))
    opt = torch.optim.AdamW([wt], lr=1e-3, weight_decay=0.01)
    wt.grad = torch.tensor(g)
    opt.step()
    np.testing.assert_allclose(
        np.asarray(new["lin"]["dense"]["kernel"]), wt.detach().numpy(),
        rtol=1e-5, atol=1e-6)


def test_adam_coupled_decay_matches_torch():
    rng = np.random.RandomState(1)
    w = rng.randn(4, 4).astype(np.float32)
    g = rng.randn(4, 4).astype(np.float32)
    params = {"k": jnp.asarray(w)}
    grads = {"k": jnp.asarray(g)}
    tx = build_optimizer(params, optimizer="Adam", learning_rate=1e-3,
                         decay=0.01, lr_scheduler="constant", clip_norm=None)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)

    wt = torch.nn.Parameter(torch.tensor(w))
    opt = torch.optim.Adam([wt], lr=1e-3, weight_decay=0.01)
    wt.grad = torch.tensor(g)
    opt.step()
    np.testing.assert_allclose(np.asarray(new["k"]), wt.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_grad_clip_matches_torch():
    rng = np.random.RandomState(2)
    g = {"a": jnp.asarray(rng.randn(8).astype(np.float32) * 10)}
    clipped, _ = optax.clip_by_global_norm(1.0).update(g, optax.clip_by_global_norm(1.0).init(g))
    gt = torch.tensor(np.asarray(g["a"]), requires_grad=False).clone()
    total = float(torch.linalg.vector_norm(gt))
    expected = gt / total
    np.testing.assert_allclose(np.asarray(clipped["a"]), expected.numpy(),
                               rtol=1e-5)
