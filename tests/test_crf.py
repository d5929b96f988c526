"""Linear-chain CRF (nn/crf.py) vs brute-force enumeration.

The reference crashes on --crf (`src/hug/tweet7.py:391-392`); the repair
ships behind --impl_crf. These tests pin the math against exhaustive path
enumeration at tiny sizes (the only oracle that can't be wrong):

  * partition == logsumexp over ALL tag paths,
  * nll == -(gold score - logZ),
  * viterbi == argmax path (score and tags),
  * interior masked steps chain their neighbors (allennlp semantics),
  * BIO constraints forbid O -> I-X at decode time only.
"""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meant_tpu.nn.crf import CRF, CRFTokenClassifier, bio_constraint_mask


def _setup(T=3, L=4, b=2, seed=0):
    rng = np.random.RandomState(seed)
    crf = CRF(T)
    emis = jnp.asarray(rng.randn(b, L, T).astype(np.float32))
    params = crf.init(jax.random.PRNGKey(0), emis,
                      jnp.zeros((b, L), jnp.int32))["params"]
    # overwrite with random values so transitions actually matter
    params = {
        "transitions": jnp.asarray(rng.randn(T, T).astype(np.float32)),
        "start_transitions": jnp.asarray(rng.randn(T).astype(np.float32)),
        "end_transitions": jnp.asarray(rng.randn(T).astype(np.float32)),
    }
    return crf, params, emis, rng


def _brute(params, emis_row, mask_row):
    """All-paths enumeration over the UNMASKED positions of one row."""
    trans = np.asarray(params["transitions"])
    start = np.asarray(params["start_transitions"])
    end = np.asarray(params["end_transitions"])
    e = np.asarray(emis_row)
    keep = [t for t in range(len(mask_row)) if mask_row[t] > 0]
    T = e.shape[-1]
    scores, paths = [], []
    for tags in itertools.product(range(T), repeat=len(keep)):
        sc = start[tags[0]] + e[keep[0], tags[0]]
        for i in range(1, len(keep)):
            sc += trans[tags[i - 1], tags[i]] + e[keep[i], tags[i]]
        sc += end[tags[-1]]
        scores.append(sc)
        paths.append(tags)
    scores = np.asarray(scores)
    logZ = scores.max() + np.log(np.exp(scores - scores.max()).sum())
    best = int(np.argmax(scores))
    return logZ, scores[best], paths[best]


def test_partition_and_nll_match_brute_force():
    crf, params, emis, rng = _setup()
    b, L, T = emis.shape
    mask = jnp.ones((b, L), jnp.float32)
    tags = jnp.asarray(rng.randint(0, T, size=(b, L)), jnp.int32)

    nll = crf.apply({"params": params}, emis, tags, mask)
    # manual: mean over rows of logZ - gold
    total = 0.0
    for i in range(b):
        logZ, _, _ = _brute(params, emis[i], np.ones(L))
        trans = np.asarray(params["transitions"])
        start = np.asarray(params["start_transitions"])
        end = np.asarray(params["end_transitions"])
        tg = np.asarray(tags[i])
        gold = start[tg[0]] + float(emis[i, 0, tg[0]])
        for t in range(1, L):
            gold += trans[tg[t - 1], tg[t]] + float(emis[i, t, tg[t]])
        gold += end[tg[-1]]
        total += logZ - gold
    np.testing.assert_allclose(float(nll), total / b, rtol=1e-5)


def test_viterbi_matches_brute_force():
    crf, params, emis, _ = _setup(T=4, L=5, b=3, seed=1)
    b, L, T = emis.shape
    mask = jnp.ones((b, L), jnp.float32)
    path, score = crf.apply({"params": params}, emis, mask,
                            method=CRF.viterbi)
    for i in range(b):
        _, best_sc, best_path = _brute(params, emis[i], np.ones(L))
        np.testing.assert_allclose(float(score[i]), best_sc, rtol=1e-5)
        assert tuple(np.asarray(path[i])) == best_path


def test_interior_mask_chains_neighbors():
    """Masked middle position: partition/viterbi must equal brute force on
    the COMPACTED sequence (emissions at masked steps ignored, transition
    jumps across)."""
    crf, params, emis, rng = _setup(T=3, L=5, b=1, seed=2)
    mask_np = np.array([[1, 1, 0, 1, 1]], np.float32)
    mask = jnp.asarray(mask_np)
    tags = jnp.asarray(rng.randint(0, 3, size=(1, 5)), jnp.int32)
    tags = tags.at[0, 2].set(-100)  # ignored position

    logZ_brute, best_sc, best_path = _brute(params, emis[0], mask_np[0])
    nll = crf.apply({"params": params}, emis, tags, mask)
    trans = np.asarray(params["transitions"])
    start = np.asarray(params["start_transitions"])
    end = np.asarray(params["end_transitions"])
    tg = np.asarray(tags[0])
    keep = [0, 1, 3, 4]
    gold = start[tg[0]] + float(emis[0, 0, tg[0]])
    for a, c in zip(keep[:-1], keep[1:]):
        gold += trans[tg[a], tg[c]] + float(emis[0, c, tg[c]])
    gold += end[tg[-1]]
    np.testing.assert_allclose(float(nll), logZ_brute - gold, rtol=1e-5)

    path, score = crf.apply({"params": params}, emis, mask,
                            method=CRF.viterbi)
    np.testing.assert_allclose(float(score[0]), best_sc, rtol=1e-5)
    assert tuple(np.asarray(path[0])[keep]) == best_path


def test_bio_constraints_at_decode_only():
    labels = {0: "O", 1: "B-ent", 2: "I-ent", 3: "B-loc", 4: "I-loc"}
    cm = bio_constraint_mask(labels)
    T = 5
    # sanity on the mask itself
    assert cm[0, 2] == False   # O -> I-ent forbidden
    assert cm[1, 2] == True    # B-ent -> I-ent
    assert cm[3, 2] == False   # B-loc -> I-ent (type mismatch)
    assert cm[T, 2] == False   # START -> I-ent
    assert cm[T, 1] == True    # START -> B-ent

    rng = np.random.RandomState(3)
    crf = CRF(T)
    b, L = 4, 6
    emis = jnp.asarray(rng.randn(b, L, T).astype(np.float32) * 3)
    params = {
        "transitions": jnp.zeros((T, T), jnp.float32),
        "start_transitions": jnp.zeros((T,), jnp.float32),
        "end_transitions": jnp.zeros((T,), jnp.float32),
    }
    mask = jnp.ones((b, L), jnp.float32)
    path, _ = crf.apply({"params": params}, emis, mask,
                        method=CRF.viterbi, constraint_mask=cm)
    p = np.asarray(path)
    cm_np = np.asarray(cm)
    for i in range(b):
        assert cm_np[T, p[i, 0]], f"START -> {p[i, 0]} violated"
        for t in range(1, L):
            assert cm_np[p[i, t - 1], p[i, t]], (
                f"transition {p[i, t-1]} -> {p[i, t]} violates BIO")
    # training loss ignores constraints (allennlp semantics): same emis,
    # gold path with an O -> I-ent transition must still be finite and
    # identical with/without the mask argument (no constraint arg exists)
    tags = jnp.asarray(np.array([[0, 2, 0, 1, 2, 0]] * b), jnp.int32)
    nll = crf.apply({"params": params}, emis, tags, mask)
    assert np.isfinite(float(nll))


def test_crf_token_classifier_end_to_end():
    """Tiny CRFTokenClassifier: loss decreases under adam; constrained
    decode emits valid BIO."""
    import optax

    labels = {0: "O", 1: "B-x", 2: "I-x"}
    model = CRFTokenClassifier(num_labels=3, vocab_size=50, hidden_size=32,
                               num_layers=1, num_heads=4, dropout=0.0)
    rng = np.random.RandomState(0)
    b, s = 8, 12
    ids = jnp.asarray(rng.randint(2, 50, size=(b, s)), jnp.int32)
    mask = jnp.ones((b, s), jnp.float32)
    tags = jnp.asarray(rng.randint(0, 3, size=(b, s)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask, tags)["params"]

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            _, nll = model.apply({"params": p}, ids, mask, tags)
            return nll
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    first = None
    for i in range(30):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < first, (first, float(loss))

    cm = bio_constraint_mask(labels)
    path, _ = model.apply({"params": params}, ids, mask,
                          constraint_mask=cm,
                          method=CRFTokenClassifier.decode)
    p = np.asarray(path)
    for i in range(b):
        assert cm[3, p[i, 0]]
        for t in range(1, s):
            assert cm[p[i, t - 1], p[i, t]]
