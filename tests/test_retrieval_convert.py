"""Oracle test for the retrieval-head checkpoint converter.

VERDICT r2 item 4: `convert_torch_retrieval_head` and
`RetrievalDatabase.from_torch_checkpoint` were the last converter surfaces
with zero coverage.  This test builds the ACTUAL reference `RetrievalModel`
(/root/reference/thirdparty/mast3r/mast3r/retrieval/model.py:107-157) with
random weights on CPU, runs its `extract_features_and_attention` +
`how_select_local` path (minus the frozen backbone — features are fed
directly), converts the state_dict, and asserts whiten / project /
attention / top-k parity — the same standard tests/test_model_scale.py sets
for the main model converter.  A synthetic codebook pickle (the asmk
`Codebook.state_dict()` layout, asmk/codebook.py:65-77) round-trips through
`from_torch_checkpoint`.
"""

import os
import pickle
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/thirdparty/mast3r"

pytestmark = [
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent"),
]

B, N, D = 2, 50, 32
HDIMS = [24, 16]  # multi-layer: exercises the Linear+LayerNorm+GELU stride
NFEAT = 7


@pytest.fixture(scope="module")
def torch_retrieval():
    """Reference RetrievalModel forward on random weights + its state_dict."""
    # dust3r.utils.image (imported transitively) needs torchvision, which is
    # not in this image; stub the two symbols it touches at import time
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")

        class _T:  # noqa: N801 - placeholder transform
            def __init__(self, *a, **k):
                pass

            def __call__(self, x):
                return x

        tvt.Compose = tvt.ToTensor = tvt.Normalize = _T
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    for p in [REF, REF + "/dust3r", REF + "/dust3r/croco"]:
        if p not in sys.path:
            sys.path.insert(0, p)

    import torch

    from mast3r.retrieval.model import RetrievalModel, how_select_local

    torch.manual_seed(0)

    class DummyBackbone(torch.nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.enc_embed_dim = dim

    model = RetrievalModel(
        DummyBackbone(D), freeze_backbone=1, prewhiten=1, hdims=HDIMS,
        residual=False, postwhiten=1, featweights="l2norm", nfeat=NFEAT,
    )
    # randomize the whiteners (they default to identity): random centering +
    # random full-rank PCA matrix, stored double as the reference does
    with torch.no_grad():
        for wh, dim in ((model.prewhiten, D), (model.postwhiten, HDIMS[-1])):
            wh.m.copy_(torch.randn(1, dim, dtype=torch.float64) * 0.1)
            wh.p.copy_(
                torch.randn(dim, dim, dtype=torch.float64) * (1.0 / np.sqrt(dim))
                + torch.eye(dim, dtype=torch.float64)
            )
    model.eval()

    rng = np.random.default_rng(7)
    feat = rng.normal(size=(B, N, D)).astype(np.float32)

    with torch.no_grad():
        # extract_features_and_attention (model.py:221-228) minus the
        # backbone call: feed the backbone tokens directly
        x = torch.from_numpy(feat)
        pre = model.prewhiten(x)
        proj = model.projector(pre)
        attn = model.attention(proj)
        whit = model.postwhiten(proj)
        topk_feat, topk_attn, topk_idx = how_select_local(whit, attn, NFEAT)

    return {
        "feat": feat,
        "pre": pre.numpy(),
        "proj": proj.numpy(),
        "attn": attn.numpy(),
        "whit": whit.numpy(),
        "topk_feat": topk_feat.numpy(),
        "topk_idx": topk_idx.numpy(),
        "state": model.state_dict(),
    }


def test_head_converter_full_parity(torch_retrieval):
    import jax.numpy as jnp

    from mast3r_slam_tpu.retrieval.head import (
        RetrievalHeadSettings,
        _project,
        _whiten,
        convert_torch_retrieval_head,
        extract_topk_features,
    )

    params = convert_torch_retrieval_head(torch_retrieval["state"])
    feat = jnp.asarray(torch_retrieval["feat"], jnp.float32)

    # stage-by-stage parity (reference whitener computes in f64; ours in f32)
    pre = _whiten(params["prewhiten"], feat)
    np.testing.assert_allclose(
        np.asarray(pre), torch_retrieval["pre"], rtol=0, atol=2e-5
    )
    proj = _project(params["projector"], pre)
    np.testing.assert_allclose(
        np.asarray(proj), torch_retrieval["proj"], rtol=0, atol=2e-5
    )
    attn = jnp.linalg.norm(proj, axis=-1)
    np.testing.assert_allclose(
        np.asarray(attn), torch_retrieval["attn"], rtol=0, atol=2e-5
    )
    whit = _whiten(params["postwhiten"], proj)
    np.testing.assert_allclose(
        np.asarray(whit), torch_retrieval["whit"], rtol=0, atol=2e-5
    )

    # end-to-end top-k selection parity
    sel = extract_topk_features(
        params, feat, RetrievalHeadSettings(nfeat=NFEAT)
    )
    assert sel.shape == (B, NFEAT, HDIMS[-1])
    np.testing.assert_allclose(
        np.asarray(sel), torch_retrieval["topk_feat"], rtol=0, atol=2e-5
    )


def test_projector_structure(torch_retrieval):
    """Converter must map the Sequential's stride-3 module indices to
    [Linear+LN, ..., bare Linear] (model.py:144-157)."""
    from mast3r_slam_tpu.retrieval.head import convert_torch_retrieval_head

    params = convert_torch_retrieval_head(torch_retrieval["state"])
    layers = params["projector"]
    assert len(layers) == len(HDIMS)
    assert layers[0]["w"].shape == (D, HDIMS[0])
    assert layers[0]["ln"] is not None  # intermediate layer has LN+GELU
    assert layers[-1]["w"].shape == (HDIMS[0], HDIMS[1])
    assert layers[-1]["ln"] is None  # final layer is a bare Linear
    assert params["prewhiten"]["m"].shape == (D,)
    assert params["postwhiten"]["p"].shape == (HDIMS[-1], HDIMS[-1])


def test_from_torch_checkpoint_roundtrip(torch_retrieval, tmp_path):
    """Checkpoint + synthetic codebook pickle through the full loader
    (processor.py:65-100 semantics)."""
    import argparse

    import torch

    from mast3r_slam_tpu.retrieval.database import RetrievalDatabase

    ckpt_path = tmp_path / "retrieval.pth"
    torch.save(
        {
            "model": torch_retrieval["state"],
            "args": argparse.Namespace(nfeat=NFEAT),
        },
        ckpt_path,
    )

    # the asmk Codebook.state_dict() pickle layout (asmk/codebook.py:65-77)
    rng = np.random.default_rng(11)
    centroids = rng.normal(size=(64, HDIMS[-1])).astype(np.float32)
    cdb_path = tmp_path / "codebook.pkl"
    with open(cdb_path, "wb") as f:
        pickle.dump(
            {
                "type": "Codebook",
                "params": {"size": 64},
                "state": {"centroids": centroids},
            },
            f,
        )

    db = RetrievalDatabase.from_torch_checkpoint(
        str(ckpt_path), str(cdb_path)
    )
    assert db.hs.nfeat == NFEAT
    np.testing.assert_allclose(np.asarray(db.centroids), centroids, atol=0)

    # the loaded database must actually run a query/add cycle
    import jax.numpy as jnp

    from mast3r_slam_tpu.slam.frame import Frame

    def mk_frame(fid, seed):
        r = np.random.default_rng(seed)
        return Frame(
            frame_id=fid,
            img=None,
            T_WC=None,
            feat=jnp.asarray(r.normal(size=(1, N, D)), jnp.float32),
            pos=None,
        )

    inds = db.update(mk_frame(0, 0), add_after_query=True, k=3,
                     min_thresh=0.0, kf_index=0)
    assert inds == []  # empty database: no candidates
    inds = db.update(mk_frame(1, 0), add_after_query=True, k=3,
                     min_thresh=5e-3, kf_index=1)
    assert 0 in inds  # identical features must retrieve keyframe 0
