"""Scanned encoder stacks (nn/stack.py): one lax.scan over layer-stacked
params == the unrolled python loop, for forward, gradients, remat policies
and the param-layout converters.

The reference has no equivalent (torch eager unrolls its nn.ModuleList,
`src/meant/meant.py:222-248`); this is the TPU-side compile-time feature for
the deep Table-1 configs (meant-30). Equivalence is asserted by initializing
the UNROLLED model and converting its params with stack_encoder_params, so
the exact same weights run through both code paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # scan/unrolled equivalence sweeps (grads at depth)

from meant_tpu.models.meant import EmbeddingConfig
from meant_tpu.models.meant_src import meant_src
from meant_tpu.nn.stack import (stack_encoder_params, unstack_encoder_params)

TINY_EMB = EmbeddingConfig(vocab_size=100, hidden_size=32,
                           max_position_embeddings=40, dropout=0.1)
N_ENC = 4
LAG, S, B = 2, 16, 2


def _model(scan_layers, remat=False, flash=False):
    return meant_src(text_dim=32, image_dim=32, price_dim=5, height=32,
                     width=32, patch_res=16, lag=LAG, num_classes=2,
                     embedding=TINY_EMB, num_heads=4, num_encoders=N_ENC,
                     channels=3, seq_len=S, flash=flash,
                     scan_layers=scan_layers, remat=remat)


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "input_ids": rng.randint(0, 100, size=(B, LAG, S)).astype(np.int32),
        "pixels": rng.randn(B, LAG, 3, 32, 32).astype(np.float32),
        "prices": rng.randn(B, LAG, 5).astype(np.float32),
        "attention_mask": np.ones((B, LAG, S), np.float32),
    }


def _to_scanned(unrolled_params):
    p = stack_encoder_params(unrolled_params["params"],
                             "languageEncoders", N_ENC)
    p = stack_encoder_params(p, "visionEncoders", N_ENC)
    return {"params": p}


@pytest.fixture(scope="module")
def unrolled_and_batch():
    model = _model(scan_layers=False)
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), **batch)
    return model, variables, batch


def test_scanned_param_shapes(unrolled_and_batch):
    model, variables, batch = unrolled_and_batch
    scanned = _to_scanned(variables)
    stacked = scanned["params"]["languageEncoders_scan"]["enc"]
    # every leaf gains a leading layer axis
    for leaf in jax.tree.leaves(stacked):
        assert leaf.shape[0] == N_ENC
    # scanned init produces the SAME tree structure and shapes
    init_scan = _model(scan_layers=True).init(jax.random.PRNGKey(0), **batch)
    assert (jax.tree.structure(init_scan)
            == jax.tree.structure(scanned))
    assert all(a.shape == b.shape for a, b in
               zip(jax.tree.leaves(init_scan), jax.tree.leaves(scanned)))


def test_stack_unstack_round_trip(unrolled_and_batch):
    _, variables, _ = unrolled_and_batch
    p = variables["params"]
    rt = unstack_encoder_params(
        stack_encoder_params(p, "languageEncoders", N_ENC),
        "languageEncoders", N_ENC)
    assert sorted(rt.keys()) == sorted(p.keys())
    for a, b in zip(jax.tree.leaves(rt["languageEncoders_2"]),
                    jax.tree.leaves(p["languageEncoders_2"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("remat", [False, True, "dots"])
def test_scanned_forward_matches_unrolled(unrolled_and_batch, remat):
    model, variables, batch = unrolled_and_batch
    ref = model.apply(variables, **batch)
    out = _model(scan_layers=True, remat=remat).apply(
        _to_scanned(variables), **batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("remat", [False, "dots"])
def test_scanned_grads_match_unrolled(unrolled_and_batch, remat):
    model, variables, batch = unrolled_and_batch
    y = jnp.array([0, 1], jnp.int32)

    def loss_unrolled(params):
        out = model.apply({"params": params}, **batch)
        return -jnp.mean(jax.nn.log_softmax(out)[jnp.arange(B), y])

    scan_model = _model(scan_layers=True, remat=remat)

    def loss_scanned(params):
        out = scan_model.apply({"params": params}, **batch)
        return -jnp.mean(jax.nn.log_softmax(out)[jnp.arange(B), y])

    g_ref = jax.grad(loss_unrolled)(variables["params"])
    g_scan = jax.grad(loss_scanned)(_to_scanned(variables)["params"])
    # compare the scanned grads against the STACKED unrolled grads
    g_ref_stacked = _to_scanned({"params": g_ref})["params"]
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4),
        g_scan, g_ref_stacked)


def test_unrolled_dots_remat_matches_no_remat(unrolled_and_batch):
    model, variables, batch = unrolled_and_batch
    ref = model.apply(variables, **batch)
    out = _model(scan_layers=False, remat="dots").apply(variables, **batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_scanned_flash_matches_unrolled_flash(unrolled_and_batch):
    # flash path (interpret-mode kernel on CPU) through the scanned stack
    _, variables, batch = unrolled_and_batch
    ref = _model(scan_layers=False, flash=True).apply(variables, **batch)
    out = _model(scan_layers=True, flash=True).apply(
        _to_scanned(variables), **batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_export_accepts_scanned_layout():
    # a scan_layers-trained checkpoint exports to the SAME torch state_dict
    # as its unrolled twin (utils/port._ensure_unrolled)
    from meant_tpu.models.meant import meant
    from meant_tpu.utils.port import export_meant

    model = meant(text_dim=32, image_dim=32, price_dim=4, height=32,
                  width=32, patch_res=16, lag=LAG, num_classes=2,
                  embedding=TINY_EMB, num_heads=4, num_encoders=2,
                  channels=4)
    rng = np.random.RandomState(1)
    batch = dict(
        tweets=rng.randint(0, 100, size=(B, LAG, S)).astype(np.int32),
        images=rng.randn(B, LAG, 4, 32, 32).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), **batch)
    p = variables["params"]
    sd_unrolled = export_meant(p, 2)
    sp = stack_encoder_params(p, "languageEncoders", 2)
    sp = stack_encoder_params(sp, "visionEncoders", 2)
    sd_scanned = export_meant(sp, 2)
    assert sorted(sd_scanned) == sorted(sd_unrolled)
    for k in sd_unrolled:
        np.testing.assert_array_equal(sd_scanned[k], sd_unrolled[k])


def test_cli_plumbs_scan_layers_and_remat():
    from meant_tpu.cli.common import base_parser, build_model

    args = base_parser().parse_args(
        ["-rid", "t", "-mn", "meant_src", "--scan_layers", "--remat",
         "dots", "--seq_len", "512"])
    model = build_model(args)
    assert model.scan_layers is True and model.remat == "dots"
    # bare --remat means 'full'
    args = base_parser().parse_args(
        ["-rid", "t", "-mn", "meant", "--remat"])
    assert build_model(args).remat == "full"
    # the other deep-tower models plumb the flags too
    args = base_parser().parse_args(
        ["-rid", "t", "-mn", "meant_tweet", "--scan_layers"])
    assert build_model(args).scan_layers is True
    # timesformer family joined SCAN_MODELS in round 4
    args = base_parser().parse_args(
        ["-rid", "t", "-mn", "meant_timesformer", "--scan_layers"])
    assert build_model(args).scan_layers is True
    # unsupported model refuses loudly rather than silently ignoring
    args = base_parser().parse_args(
        ["-rid", "t", "-mn", "bertweet", "--scan_layers"])
    with pytest.raises(SystemExit):
        build_model(args)


def test_other_models_scan_matches_unrolled():
    # every deep-tower model dispatches through the same _lang_tower/
    # _vision_tower helpers; cover each constructor + the mask=None
    # broadcast-ctx case (meant_tweet_no_lag / meantPrice / meant_vqa)
    from meant_tpu.models.meant import (meant, meantPrice, meant_tweet,
                                        meant_tweet_no_lag, meant_vision,
                                        meant_vqa)

    rng = np.random.RandomState(3)
    tweets_lag = rng.randint(0, 100, size=(B, LAG, S)).astype(np.int32)
    tweets_flat = rng.randint(0, 100, size=(B, S)).astype(np.int32)
    imgs_lag = rng.randn(B, LAG, 4, 32, 32).astype(np.float32)
    img_flat = rng.randn(B, 4, 32, 32).astype(np.float32)
    prices = rng.randn(B, LAG, 4).astype(np.float32)
    geo = dict(num_heads=4, num_encoders=N_ENC, embedding=TINY_EMB)

    cases = [
        (meant(32, 32, 4, 32, 32, 16, LAG, 2, channels=4, **geo),
         ("languageEncoders", "visionEncoders"), (tweets_lag, imgs_lag)),
        (meant_vision(32, 4, 32, 32, 16, LAG, 2, num_heads=4,
                      num_encoders=N_ENC),
         ("visionEncoders",), (imgs_lag,)),
        (meant_tweet(32, 4, LAG, 2, **geo),
         ("languageEncoders",), (tweets_lag,)),
        (meant_tweet_no_lag(32, 4, 32, 32, 16, 2, **geo),
         ("languageEncoders",), (tweets_flat,)),
        (meantPrice(32, 32, 4, 32, 32, 16, LAG, 2, **geo),
         ("languageEncoders", "visionEncoders"),
         (tweets_lag, imgs_lag, prices)),
        (meant_vqa(32, 32, 4, 32, 32, 16, 1, 2, **geo),
         ("languageEncoders", "visionEncoders"), (tweets_flat, img_flat)),
    ]
    for model, prefixes, inputs in cases:
        variables = model.init(jax.random.PRNGKey(0), *inputs)
        ref = model.apply(variables, *inputs)
        p = variables["params"]
        for prefix in prefixes:
            p = stack_encoder_params(p, prefix, N_ENC)
        out = model.clone(scan_layers=True).apply({"params": p}, *inputs)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5,
            err_msg=type(model).__name__)


def test_pretrainers_scan_matches_unrolled():
    from meant_tpu.models.pretrainers import (meant_language_pretrainer,
                                              meant_vision_pretrainer)

    rng = np.random.RandomState(2)
    words = rng.randint(0, 100, size=(B, S)).astype(np.int32)
    mask = np.ones((B, S), np.float32)
    lm = meant_language_pretrainer(num_encoders=N_ENC, embedding=TINY_EMB,
                                   text_dim=32, num_heads=4)
    v = lm.init(jax.random.PRNGKey(0), words, mask)
    ref = lm.apply(v, words, mask)
    sp = {"params": stack_encoder_params(v["params"],
                                         "languageEncoders", N_ENC)}
    out = lm.clone(scan_layers=True).apply(sp, words, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    imgs = rng.randn(B, 4, 32, 32).astype(np.float32)
    vm = meant_vision_pretrainer(num_encoders=N_ENC, patch_res=16,
                                 height=32, width=32, image_dim=32,
                                 num_heads=4)
    v = vm.init(jax.random.PRNGKey(0), imgs)
    ref = vm.apply(v, imgs)
    sp = {"params": stack_encoder_params(v["params"],
                                         "visionEncoders", N_ENC)}
    out = vm.clone(scan_layers=True).apply(sp, imgs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_tp_rules_shift_for_scanned_layout(unrolled_and_batch):
    # TP sharding rules place 'model' on the same LOGICAL axis for scanned
    # towers: stacked kernels are (L, in, out), so the megatron specs shift
    # right by one and the layer axis stays replicated
    from jax.sharding import PartitionSpec as P
    from meant_tpu.parallel import make_mesh, param_shardings, shard_params

    model, variables, batch = unrolled_and_batch
    scanned = _to_scanned(variables)["params"]
    mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
    shardings = param_shardings(scanned, mesh)
    enc = shardings["languageEncoders_scan"]["enc"]["attn"]
    assert enc["q"]["dense"]["kernel"].spec == P(None, None, "model")
    assert enc["multi_mad"]["dense"]["kernel"].spec == P(None, "model", None)
    # unrolled rules are unchanged by the shift logic
    un = param_shardings(variables["params"], mesh)
    assert un["languageEncoders_0"]["attn"]["q"]["dense"]["kernel"].spec \
        == P(None, "model")
    # and the TP-sharded scanned forward still matches the replicated run
    ref = _model(scan_layers=True).apply({"params": scanned}, **batch)
    out = jax.jit(lambda p: _model(scan_layers=True).apply(
        {"params": p}, **batch))(shard_params(scanned, mesh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_graft_across_param_layouts(unrolled_and_batch):
    # an UNROLLED pretraining checkpoint grafts into a scan_layers model
    # (stacked on the fly) and a scanned checkpoint into an unrolled model —
    # the key mismatch must not silently skip the copy
    from meant_tpu.train.checkpoint import graft

    model, variables, batch = unrolled_and_batch
    unrolled = variables["params"]
    scanned = _to_scanned(variables)["params"]

    fresh_scan = jax.tree.map(jnp.zeros_like, scanned)
    grafted = graft(fresh_scan, unrolled)
    for a, b in zip(jax.tree.leaves(grafted["languageEncoders_scan"]),
                    jax.tree.leaves(scanned["languageEncoders_scan"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    fresh_unrolled = jax.tree.map(jnp.zeros_like, unrolled)
    grafted = graft(fresh_unrolled, scanned)
    for a, b in zip(jax.tree.leaves(grafted["languageEncoders_2"]),
                    jax.tree.leaves(unrolled["languageEncoders_2"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # non-encoder subtrees stay untouched on layout mismatch
    assert float(jnp.sum(jnp.abs(
        jax.tree.leaves(grafted["temporal_encoding_0"])[0]))) == 0.0

    # a DEEPER unrolled source grafts its FIRST layers into a shallower
    # scanned target — same partial-graft semantics as unrolled→unrolled
    shallow = meant_src(
        text_dim=32, image_dim=32, price_dim=5, height=32, width=32,
        patch_res=16, lag=LAG, num_classes=2, embedding=TINY_EMB,
        num_heads=4, num_encoders=2, channels=3, seq_len=S,
        scan_layers=True)
    sv = shallow.init(jax.random.PRNGKey(1), **batch)
    grafted = graft(jax.tree.map(jnp.zeros_like, sv["params"]), unrolled)
    want = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                        unrolled["languageEncoders_0"],
                        unrolled["languageEncoders_1"])
    for a, b in zip(jax.tree.leaves(
            grafted["languageEncoders_scan"]["enc"]),
            jax.tree.leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scanned_dropout_trains(unrolled_and_batch):
    # non-deterministic path: per-layer dropout rngs split, loss finite,
    # and a jitted grad step executes under scan
    model, variables, batch = unrolled_and_batch
    scan_model = _model(scan_layers=True, remat="dots")
    params = _to_scanned(variables)["params"]
    y = jnp.array([0, 1], jnp.int32)

    @jax.jit
    def step(params):
        def loss_fn(p):
            out = scan_model.apply(
                {"params": p}, **batch, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(3)})
            return -jnp.mean(jax.nn.log_softmax(out)[jnp.arange(B), y])
        return jax.value_and_grad(loss_fn)(params)

    loss, grads = step(params)
    assert np.isfinite(float(loss))
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(grads)))
    assert float(gnorm) > 0.0


def _ts_models():
    from meant_tpu.models.meant_timesformer import (meant_mean_pooling,
                                                    meant_mosi,
                                                    meant_timesformer)
    return meant_timesformer, meant_mean_pooling, meant_mosi


def test_timesformer_scan_matches_unrolled():
    """Standalone TimeSformer: depth rolled into ONE lax.scan over the
    layers_scan layout == the unrolled loop, fwd + grads, converters
    round-trip (nn/timesformer.TSBlock + nn/stack.*_timesformer_params)."""
    from meant_tpu.nn.stack import (stack_timesformer_params,
                                    unstack_timesformer_params)
    from meant_tpu.nn.timesformer import TimeSformer

    depth = 3
    kw = dict(dim=32, num_frames=2, num_classes=2, image_size=16,
              patch_size=8, channels=3, depth=depth, heads=4, dim_head=8)
    video = np.random.RandomState(0).randn(2, 2, 3, 16, 16) \
        .astype(np.float32)
    un = TimeSformer(**kw)
    v = un.init(jax.random.PRNGKey(0), video)
    ref_logits = un.apply(v, video)
    ref_tokens = un.apply(v, video, return_tokens=True)

    sp = stack_timesformer_params(v["params"], depth)
    for comp in ("time_attn", "ff"):
        for leaf in jax.tree.leaves(sp["layers_scan"]["enc"][comp]):
            assert leaf.shape[0] == depth
    sc = TimeSformer(**kw, scan_layers=True)
    # scanned init produces the same structure/shapes as the converted tree
    init_scan = sc.init(jax.random.PRNGKey(0), video)
    assert (jax.tree.structure(init_scan["params"])
            == jax.tree.structure(sp))
    out_logits = sc.apply({"params": sp}, video)
    out_tokens = sc.apply({"params": sp}, video, return_tokens=True)
    np.testing.assert_allclose(np.asarray(out_logits),
                               np.asarray(ref_logits), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_tokens),
                               np.asarray(ref_tokens), atol=1e-5, rtol=1e-5)

    # converters round-trip
    rt = unstack_timesformer_params(sp, depth)
    assert sorted(rt.keys()) == sorted(v["params"].keys())
    for a, b in zip(jax.tree.leaves(rt["space_attn_1"]),
                    jax.tree.leaves(v["params"]["space_attn_1"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # grads through the scanned (always-rematerialized) body == unrolled
    def loss(model, params):
        out = model.apply({"params": params}, video)
        return -jnp.mean(jax.nn.log_softmax(out)[jnp.arange(2),
                                                 jnp.array([0, 1])])

    g_ref = jax.grad(lambda p: loss(un, p))(v["params"])
    g_scan = jax.grad(lambda p: loss(sc, p))(sp)
    g_ref_stacked = stack_timesformer_params(g_ref, depth)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4),
        g_scan, g_ref_stacked)


def test_timesformer_family_models_scan_match_unrolled():
    """meant_timesformer / meant_mean_pooling / meant_mosi with
    scan_layers=True: language tower AND TimeSformer depth axis scanned,
    forward == unrolled at converted weights (VERDICT r3 #3)."""
    from meant_tpu.nn.stack import stack_timesformer_params

    meant_timesformer, meant_mean_pooling, meant_mosi = _ts_models()
    rng = np.random.RandomState(4)
    n_enc = 3
    batch = {
        "input_ids": rng.randint(0, 100, (B, LAG, S)).astype(np.int32),
        "pixels": rng.randn(B, LAG, 3, 32, 32).astype(np.float32),
        "prices": rng.randn(B, LAG, 5).astype(np.float32),
        "attention_mask": np.ones((B, LAG, S), np.float32),
    }
    geo = dict(text_dim=32, image_dim=32, price_dim=5, height=32, width=32,
               patch_res=16, lag=LAG, num_classes=2, embedding=TINY_EMB,
               num_heads=4, num_encoders=n_enc, channels=3, seq_len=S)
    for cls in (meant_timesformer, meant_mean_pooling):
        un = cls(**geo)
        v = un.init(jax.random.PRNGKey(0), **batch)
        ref = un.apply(v, **batch)
        p = stack_encoder_params(v["params"], "languageEncoders", n_enc)
        p["timesformer"] = stack_timesformer_params(p["timesformer"], 1)
        out = cls(**geo, scan_layers=True).apply({"params": p}, **batch)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=cls.__name__)

    # mosi: pre-embedded text, patch-1 TimeSformer at depth=num_encoders
    mosi_batch = {
        "input_ids": rng.randn(B, 8, 32).astype(np.float32),
        "pixels": rng.randn(B, 10, 20).astype(np.float32),
        "audio": rng.randn(B, 6, 130).astype(np.float32),
        "audio_mask": np.ones((B, 6), np.float32),
    }
    un = meant_mosi(text_dim=32, image_dim=32, lag=10, num_classes=2,
                    embedding=None, num_heads=4, num_encoders=n_enc)
    v = un.init(jax.random.PRNGKey(0), **mosi_batch)
    ref = un.apply(v, **mosi_batch)
    p = stack_encoder_params(v["params"], "languageEncoders", n_enc)
    p["timesformer"] = stack_timesformer_params(p["timesformer"], n_enc)
    out = meant_mosi(text_dim=32, image_dim=32, lag=10, num_classes=2,
                     embedding=None, num_heads=4, num_encoders=n_enc,
                     scan_layers=True).apply({"params": p}, **mosi_batch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_timesformer_tp_rules_cover_scanned_layout():
    """to_qkv/to_out enter the megatron rule set; the scanned layers_scan
    layout shifts them right by one (layer axis replicated)."""
    from jax.sharding import PartitionSpec as P
    from meant_tpu.nn.stack import stack_timesformer_params
    from meant_tpu.nn.timesformer import TimeSformer
    from meant_tpu.parallel import make_mesh, param_shardings

    ts = TimeSformer(dim=32, num_frames=2, num_classes=2, image_size=16,
                     patch_size=8, channels=3, depth=2, heads=4, dim_head=8)
    video = np.zeros((1, 2, 3, 16, 16), np.float32)
    v = ts.init(jax.random.PRNGKey(0), video)
    mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
    un = param_shardings(v["params"], mesh)
    assert un["time_attn_0"]["to_qkv"]["kernel"].spec == P(None, "model")
    assert un["time_attn_0"]["to_out"]["kernel"].spec == P("model", None)
    sp = stack_timesformer_params(v["params"], 2)
    sc = param_shardings(sp, mesh)
    enc = sc["layers_scan"]["enc"]
    assert enc["time_attn"]["to_qkv"]["kernel"].spec \
        == P(None, None, "model")
    assert enc["time_attn"]["to_out"]["kernel"].spec \
        == P(None, "model", None)
