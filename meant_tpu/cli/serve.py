"""Batch-inference CLI around meant_tpu.serve.Predictor.

The reference has no serving story (SURVEY §4 — eval loops only); this is
the production path: restore an orbax checkpoint, jit a fixed-shape
forward, stream .npz batches through the mesh, write probabilities.

    python -m meant_tpu.cli.serve -rid 0 -mn meant \\
        --checkpoint models/meant/<ckpt> --input batch.npz --output probs.npy

`--input` is an .npz whose arrays match the model's batch keys (tweets /
graphs / input_ids / pixels / prices / attention_masks); omit it for a
synthetic smoke batch."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from meant_tpu.cli.common import base_parser, build_model
from meant_tpu.serve import Predictor


def serve_parser():
    p = base_parser()
    p.add_argument("--checkpoint", type=str, default=None,
                   help="orbax checkpoint path (omit for random init)")
    p.add_argument("--input", type=str, default=None,
                   help=".npz of batch arrays; synthetic smoke if omitted")
    p.add_argument("--output", type=str, default=None,
                   help="write probabilities to this .npy")
    p.add_argument("--serve_batch", type=int, default=32)
    p.add_argument("--int8", action="store_true",
                   help="quantize wide Dense layers to int8 on the MXU "
                        "(nn/quant.py; ~1.2-1.4x on FF/projection matmuls)")
    p.add_argument("--export", type=str, default=None,
                   help="also write the jitted forward as a StableHLO "
                        "artifact (jax.export) — servable without the "
                        "python model code")
    return p


def _synthetic_batch(args):
    """Smoke batch matching the model's dispatch family: positional
    paper-era models read tweets/graphs/attention_masks
    (`train.classify.model_inputs`), kwargs-era models read
    input_ids/pixels/prices/attention_mask (`src/trainer.py:236-243`)."""
    from meant_tpu.train.classify import KWARGS_MODELS

    rng = np.random.RandomState(0)
    n, lag, s = args.synthetic_n, args.lag, args.seq_len
    size = args.image_size
    name = args.model_name
    if name in ("meant_price", "mlp", "lstm"):
        return {"prices": rng.randn(n, lag, 5).astype(np.float32)}
    if name == "meant_mosi":
        # MOSI features: pre-embedded text, 20-d video frames, 130-d audio
        # over 50 frames (`src/utils/custom_datasets.py:574-607`)
        f = 50
        return {
            "input_ids": rng.randn(n, f, args.text_dim).astype(np.float32),
            "pixels": rng.randn(n, f, 20).astype(np.float32),
            "audio": rng.randn(n, f, 130).astype(np.float32),
            "audio_mask": np.ones((n, f), np.float32),
        }
    if name in KWARGS_MODELS:
        return {
            "input_ids": rng.randint(2, args.vocab_size - 1,
                                     size=(n, lag, s)).astype(np.int32),
            "pixels": rng.randn(n, lag, 3, size, size).astype(np.float32),
            "prices": rng.randn(n, lag, 5).astype(np.float32),
            "attention_mask": np.ones((n, lag, s), np.float32),
        }
    batch = {
        "tweets": rng.randint(2, args.vocab_size - 1,
                              size=(n, lag, s)).astype(np.int32),
        "graphs": rng.randn(n, lag, 4, size, size).astype(np.float32),
        "attention_masks": np.ones((n, lag, s), np.float32),
    }
    if name in ("meantPrice", "meant_tweet_price", "teanet"):
        batch["prices"] = rng.randn(n, lag, 5 if name ==
                                    "meant_tweet_price" else 4) \
            .astype(np.float32)
    return batch


def main(argv=None):
    args = serve_parser().parse_args(argv)
    model = build_model(args)
    if args.input:
        z = np.load(args.input)
        batch = {k: z[k] for k in z.files}
    else:
        print("No --input: synthetic smoke batch.")
        batch = _synthetic_batch(args)

    params = None
    if args.checkpoint is None:
        # random init from the batch shapes (smoke / structure check)
        import jax
        from meant_tpu.train.classify import model_inputs
        a, kw = model_inputs(args.model_name, batch)
        variables = model.init(jax.random.PRNGKey(0),
                               *(jnp.asarray(x) for x in a),
                               **{k: (jnp.asarray(v) if v is not None
                                      else None) for k, v in kw.items()})
        params = variables["params"]

    predictor = Predictor(model, args.model_name, params=params,
                          checkpoint_path=args.checkpoint,
                          batch_size=args.serve_batch,
                          quantize="int8" if args.int8 else None)
    probs = predictor(batch)
    print(f"served {len(probs)} rows -> probs shape {probs.shape}, "
          f"mean {float(probs.mean()):.4f}")
    if args.export:
        from meant_tpu.serve import export_forward
        # the artifact's batch dim is FIXED at trace shape — pad short
        # inputs up to the serve_batch contract (same first-row repeat as
        # Predictor.__call__) so the export matches what serving will feed
        chunk = {k: v[:args.serve_batch] for k, v in batch.items()}
        pad = args.serve_batch - len(next(iter(chunk.values())))
        if pad > 0:
            chunk = {k: np.concatenate([v, np.repeat(v[:1], pad, axis=0)],
                                       axis=0) for k, v in chunk.items()}
        export_forward(model, args.model_name, predictor.params, chunk,
                       args.export,
                       quantize="int8" if args.int8 else None)
        print(f"wrote StableHLO artifact {args.export}")
    if args.output:
        np.save(args.output, probs)
        print(f"wrote {args.output}")
    return probs


if __name__ == "__main__":
    main()
