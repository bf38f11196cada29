"""Retrieval stack tests: hamming ops vs numpy oracle (the reference's own
test strategy, asmk/test/test_hamming.py), ASMK database behaviour, and the
top-k feature head."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mast3r_slam_tpu.retrieval.asmk import (
    ASMKSettings,
    DeviceIVF,
    aggregate_residuals,
    binarize_pack,
    hamming_sim,
    quantize,
    _unique_static,
)
from mast3r_slam_tpu.retrieval.head import (
    RetrievalHeadSettings,
    extract_topk_features,
    init_head_params,
)
from mast3r_slam_tpu.retrieval.database import RetrievalDatabase


@pytest.mark.parametrize("dim", [24, 32, 64, 100])
def test_binarize_pack_hamming_vs_numpy(rng, dim):
    a = rng.normal(size=(7, dim)).astype(np.float32)
    b = rng.normal(size=(13, dim)).astype(np.float32)
    pa = binarize_pack(jnp.asarray(a))
    pb = binarize_pack(jnp.asarray(b))
    # numpy oracle: normalized hamming similarity of sign patterns
    sa = a > 0
    sb = b > 0
    for i in range(7):
        d = (sa[i][None, :] != sb).sum(axis=1)
        sim_ref = 1.0 - 2.0 * d / dim
        sim = np.asarray(hamming_sim(pa[i], pb, dim))
        np.testing.assert_allclose(sim, sim_ref, atol=1e-6)


def test_quantize_matches_bruteforce(rng):
    vecs = rng.normal(size=(20, 16)).astype(np.float32)
    cents = rng.normal(size=(50, 16)).astype(np.float32)
    idx = np.asarray(quantize(jnp.asarray(vecs), jnp.asarray(cents), 5))
    d = ((vecs[:, None] - cents[None]) ** 2).sum(-1)
    ref = np.argsort(d, axis=1)[:, :5]
    np.testing.assert_array_equal(np.sort(idx, axis=1), np.sort(ref, axis=1))


def test_unique_static(rng):
    x = jnp.asarray(rng.integers(0, 10, size=(20,)), dtype=jnp.int32)
    uniq, inv = _unique_static(x, 20)
    uniq_np = np.asarray(uniq)
    # every element maps back to its own value
    np.testing.assert_array_equal(uniq_np[np.asarray(inv)], np.asarray(x))
    # uniq contains exactly the set of values then -1 padding
    vals = uniq_np[uniq_np >= 0]
    assert sorted(set(vals.tolist())) == sorted(set(np.asarray(x).tolist()))


def test_aggregate_residuals_matches_reference_semantics(rng):
    """Per-word residual sums must equal the reference aggregate_image
    (kernel.py:26-38) computed with numpy."""
    n, d, ma, C = 12, 8, 2, 6
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    cents = rng.normal(size=(C, d)).astype(np.float32)
    # distinct words per row (matches quantize's top-k guarantee)
    word_ids = np.stack(
        [rng.choice(C, size=ma, replace=False) for _ in range(n)]
    ).astype(np.int32)
    agg, words, valid = aggregate_residuals(
        jnp.asarray(vecs), jnp.asarray(word_ids), jnp.asarray(cents), n * ma
    )
    agg = np.asarray(agg)
    words_np = np.asarray(words)
    for w in np.unique(word_ids):
        ref = (vecs[(word_ids == w).any(axis=1)] - cents[w]).sum(0)
        slot = np.nonzero(words_np == w)[0]
        assert len(slot) == 1
        got = agg[slot[0]]
        # NOTE: a vec assigned the same word twice would differ; quantize
        # guarantees distinct assignments so equality holds
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_ivf_retrieves_similar_image(rng):
    """Build a database of images with cluster-structured features; a query
    near image 1's features must rank image 1 first."""
    dim, nfeat = 32, 20
    s = ASMKSettings(capacity=1000, max_images=16)
    ivf = DeviceIVF(dim, s)
    cents = jnp.asarray(rng.normal(size=(40, dim)).astype(np.float32))

    def make_feats(seed):
        r = np.random.default_rng(seed)
        return jnp.asarray(r.normal(size=(nfeat, dim)).astype(np.float32))

    feats = [make_feats(i) for i in range(4)]
    for f in feats:
        codes = quantize(f, cents, 1)
        agg, words, valid = aggregate_residuals(f, codes, cents, nfeat)
        ivf.add(binarize_pack(agg), words, valid)

    # query: image 1's features + small noise, MA=5
    q = feats[1] + jnp.asarray(rng.normal(size=(nfeat, dim)).astype(np.float32)) * 0.05
    codes = quantize(q, cents, s.ma_query)
    agg, words, valid = aggregate_residuals(q, codes, cents, nfeat * s.ma_query)
    scores = np.asarray(ivf.search(binarize_pack(agg), words, valid))
    assert np.argmax(scores[:4]) == 1, scores[:4]
    assert scores[1] > 2 * np.partition(scores[:4], -2)[-2] * 0.5


def test_database_update_flow(rng):
    """kf-by-kf update() mirrors the reference API: no query on the first
    frame, self-similar frames retrieved later."""

    class FakeFrame:
        def __init__(self, feat):
            self.feat = feat

    db = RetrievalDatabase.random_init(jax.random.key(0), backbone_dim=32,
                                       proj_dim=16, num_centroids=64, nfeat=16)
    frames = []
    for i in range(5):
        r = np.random.default_rng(i)
        tokens = r.normal(size=(1, 48, 32)).astype(np.float32)
        frames.append(FakeFrame(jnp.asarray(tokens)))

    assert db.update(frames[0], add_after_query=True, k=3) == []
    db.update(frames[1], add_after_query=True, k=3)
    db.update(frames[2], add_after_query=True, k=3)

    # a near-duplicate of frame 1 must retrieve index 1 first
    near = FakeFrame(frames[1].feat + 0.01)
    inds = db.update(near, add_after_query=False, k=1, min_thresh=0.0)
    assert inds == [1], inds


def test_topk_feature_head_selects_high_attention(rng):
    params = init_head_params(jax.random.key(0), backbone_dim=16, hdims=(8,))
    feat = rng.normal(size=(1, 30, 16)).astype(np.float32) * 0.1
    feat[0, 7] *= 100.0  # dominant-norm token
    hs = RetrievalHeadSettings(nfeat=4)
    sel = extract_topk_features(params, jnp.asarray(feat), hs)
    assert sel.shape == (1, 4, 8)
    # the projected dominant token must be among the selected (norm attention)
    proj = (feat[0] - 0) @ np.asarray(params["projector"][0]["w"])
    assert np.allclose(
        np.asarray(sel[0]).max(), proj[7].max(), rtol=1e-4
    ) or np.asarray(jnp.abs(sel)).max() >= abs(proj[7]).max() * 0.9
