"""Predictor: checkpoint restore + fixed-shape batched inference."""

import numpy as np

from meant_tpu.models import EmbeddingConfig, meant_tweet
from meant_tpu.serve import Predictor

import jax

TINY_EMB = EmbeddingConfig(vocab_size=64, hidden_size=32,
                           max_position_embeddings=40, dropout=0.0)


def test_predictor_pads_and_matches_direct():
    import jax.numpy as jnp
    model = meant_tweet(text_dim=32, price_dim=4, lag=5, num_classes=2,
                        embedding=TINY_EMB, num_heads=4, num_encoders=1)
    rng = np.random.RandomState(0)
    tweets = rng.randint(2, 64, size=(11, 5, 12)).astype(np.int32)
    mask = np.ones((11, 5, 12), np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(tweets),
                        jnp.asarray(mask))["params"]
    pred = Predictor(model, "meant_tweet", params=params, batch_size=4)
    probs = pred({"tweets": tweets, "attention_masks": mask})
    assert probs.shape == (11, 2)
    direct = np.asarray(model.apply({"params": params},
                                    jnp.asarray(tweets), jnp.asarray(mask)))
    np.testing.assert_allclose(probs, direct, rtol=1e-5, atol=1e-6)


def test_serve_cli_smoke(tmp_path):
    from meant_tpu.cli import serve as serve_cli
    out = tmp_path / "probs.npy"
    probs = serve_cli.main([
        "-rid", "50", "-mn", "meant_tweet", "-nec", "1",
        "--synthetic_n", "20", "--seq_len", "12", "--image_size", "32",
        "--text_dim", "32", "--image_dim", "32", "--vocab_size", "128",
        "--num_heads", "4", "--serve_batch", "8",
        "--output", str(out)])
    import numpy as np
    assert probs.shape == (20, 2)
    assert np.load(out).shape == (20, 2)


def test_serve_cli_checkpoint_round_trip(tmp_path):
    """Train one epoch via the trainer, serve from its saved checkpoint."""
    import numpy as np
    from meant_tpu.cli import in_loop_train
    from meant_tpu.cli import serve as serve_cli
    from meant_tpu.train.checkpoint import checkpoint_name

    in_loop_train.main([
        "-rid", "51", "-mn", "meant_tweet", "-ne", "1", "-nec", "1",
        "-tb", "8", "-fp", str(tmp_path), "--synthetic_n", "24",
        "--seq_len", "12", "--image_size", "32", "--bf16", "false",
        "-lrst", "constant", "--text_dim", "32", "--image_dim", "32",
        "--vocab_size", "128", "--num_heads", "4"])
    name = checkpoint_name("meant_tweet", 1, "Tempstock", "51", 1)
    ckpt = str(tmp_path / "models" / "meant_tweet" / name)
    probs = serve_cli.main([
        "-rid", "52", "-mn", "meant_tweet", "-nec", "1",
        "--checkpoint", ckpt,
        "--synthetic_n", "16", "--seq_len", "12", "--image_size", "32",
        "--text_dim", "32", "--image_dim", "32", "--vocab_size", "128",
        "--num_heads", "4", "--serve_batch", "8"])
    assert probs.shape == (16, 2)
    assert np.isfinite(probs).all()


def test_predictor_tensor_parallel_matches_replicated():
    """TP-sharded serving: megatron-sharded params over the mesh's 'model'
    axis produce the same probabilities as replicated serving (serve a
    model bigger than one chip's HBM)."""
    import jax.numpy as jnp

    from meant_tpu.parallel import make_mesh

    model = meant_tweet(text_dim=32, price_dim=4, lag=5, num_classes=2,
                        embedding=TINY_EMB, num_heads=4, num_encoders=1)
    rng = np.random.RandomState(1)
    tweets = rng.randint(2, 64, size=(8, 5, 12)).astype(np.int32)
    mask = np.ones((8, 5, 12), np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(tweets),
                        jnp.asarray(mask))["params"]

    rep = Predictor(model, "meant_tweet", params=params, batch_size=8)
    n = len(jax.devices())
    mesh = make_mesh(axes=("data", "model"), shape=(1, n))
    tp = Predictor(model, "meant_tweet", params=params, batch_size=8,
                   mesh=mesh, tensor_parallel=True)
    # something actually sharded over 'model'
    flat = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(lambda a: a.sharding, tp.params))[0]
    assert any("model" in str(sh.spec) for _, sh in flat)

    batch = {"tweets": tweets, "attention_masks": mask}
    np.testing.assert_allclose(tp(batch), rep(batch), rtol=1e-5, atol=1e-6)
