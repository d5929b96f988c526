"""MIM pretraining harness — rebuild of `pretrain_mim.py` (same flags).
Data: --data_dir with image `.npy` stacks (n, c, H, W); synthetic in smoke
mode. Per-pixel Bernoulli masking, L1 reconstruction on RGB channels."""

from __future__ import annotations

import os
import time

import numpy as np

import jax.numpy as jnp

from meant_tpu.cli.common import base_parser
from meant_tpu.data import ArrayLoader
from meant_tpu.data.masking import mask_image
from meant_tpu.models import meant_vision_pretrainer
from meant_tpu.parallel import make_mesh
from meant_tpu.train.pretrain import mim_pretrainer


def load_images(args):
    if args.data_dir:
        for name in os.listdir(args.data_dir):
            if name.endswith(".npy"):
                return np.load(os.path.join(args.data_dir, name))
        raise FileNotFoundError(f"no .npy in {args.data_dir}")
    print("No --data_dir: synthetic images (smoke mode).")
    rng = np.random.RandomState(0)
    return rng.rand(args.synthetic_n, 4, args.image_size,
                    args.image_size).astype(np.float32)


def main(argv=None):
    p = base_parser()
    p.add_argument("--masked_only", action="store_true",
                   help="DEFECTS #30 repair: L1 on the MASKED pixels only. "
                        "Default replicates the reference's nn.L1Loss over "
                        "labels that still carry -100 at unmasked pixels "
                        "(pretrain_mim.py:204 — L1 has no ignore_index)")
    args = p.parse_args(argv)
    images = load_images(args)
    inputs, labels = mask_image(images, seed=0)
    data = {"input_ids": inputs, "labels": labels}
    n_val = max(len(images) // 10, args.train_batch_size)
    train = {k: v[n_val:] for k, v in data.items()}
    val = {k: v[:n_val] for k, v in data.items()}

    model = meant_vision_pretrainer(
        num_encoders=args.num_encoders, patch_res=16,
        channels=images.shape[1], height=images.shape[2],
        width=images.shape[3], image_dim=args.image_dim,
        num_heads=args.num_heads, flash=args.flash,
        scan_layers=args.scan_layers, remat=args.remat,
        dtype=jnp.bfloat16 if args.bf16 else None)
    trainer = mim_pretrainer({
        "model": model, "model_name": "meant_vision_pretrainer",
        "dataset": args.dataset,
        "train_data": ArrayLoader(train, args.train_batch_size,
                                  shuffle=True),
        "val_data": ArrayLoader(val, args.train_batch_size),
        "epochs": args.num_epochs, "lr": args.learning_rate,
        "decay": args.decay, "beta_1": args.beta_1, "beta_2": args.beta_2,
        "lrst": args.learning_rate_scheduler_type, "t0": args.t0,
        "tmax": args.tmax, "optimizer": args.optimizer,
        "file_path": args.file_path, "run_id": args.run_id,
        "num_encoders": args.num_encoders, "track": args.track,
        "mesh": make_mesh(), "masked_only": args.masked_only,
    })
    t0 = time.time()
    hist = trainer.train()
    print("total time:", time.time() - t0)
    return hist


if __name__ == "__main__":
    main()
