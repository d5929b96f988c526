"""Standalone evaluation harness — rebuild of `test_run.py` (load a saved
model checkpoint, run the test loop, print f1 metrics).

Usage: python -m meant_tpu.cli.eval -rid <id> -mn <model> -ptm <ckpt_path>
(plus the data flags of in_loop_train)."""

from __future__ import annotations

from meant_tpu.cli.common import base_parser, build_model
from meant_tpu.data import ArrayLoader, load_tempstock_small, split_arrays, \
    synthetic_tempstock
from meant_tpu.parallel import make_mesh
from meant_tpu.train import meant_trainer


def main(argv=None):
    args = base_parser().parse_args(argv)
    model = build_model(args)
    if args.data_dir:
        arrays = load_tempstock_small(args.data_dir,
                                      lag_suffix=f"_{args.lag}",
                                      normalize=args.normalize)
    else:
        arrays = synthetic_tempstock(n=args.synthetic_n, lag=args.lag,
                                     seq=args.seq_len, channels=4,
                                     size=args.image_size,
                                     vocab=args.vocab_size - 1)
    _, _, test = split_arrays(arrays)
    trainer = meant_trainer({
        "model": model, "model_name": args.model_name,
        "dataset": args.dataset,
        "train_loader": ArrayLoader(test, args.train_batch_size),
        "num_classes": args.num_classes, "lag": args.lag,
        "file_path": args.file_path, "run_id": args.run_id,
        "num_encoders": args.num_encoders, "mesh": make_mesh(),
    })
    if args.pretrained_model:
        trainer.load_params(args.pretrained_model)
    loader = ArrayLoader(test, args.train_batch_size, drop_remainder=False)
    f1_macro, f1_micro, metrics = trainer.evaluate(loader, "test")
    return metrics


if __name__ == "__main__":
    main()
