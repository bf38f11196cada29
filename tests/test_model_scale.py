"""Production-scale (ViT-L, 384x512) model validation proxies.

VERDICT.md round-1 item 4: round-1 parity was proven only at a 64x96 tiny
config; error compounds with depth (24 encoder blocks at ViT-L vs 2) and the
fc2 pixel-permutation / dec_blocks2 layout only get full coverage at the real
dims.  These tests build the reference torch model at FULL ViT-L size
(random weights — layout/numerics identical to pretrained), convert the
state_dict, and assert end-to-end activation parity at 384x512, plus the two
other production proxies: bf16-trunk drift bounds and a full-size npz
round-trip.

Measured on this environment (2026-08-20, CPU, x64 guards off in library):
  f32 parity   max|d|: X 3.8e-7, C 4.8e-7, D 2.0e-6, Q 2.0e-6
  bf16 trunk   max|d|: X 1.3e-3, C 1.6e-3, D 1.6e-2
Tolerances below carry ~5-10x margin over those.

Reference stack: /root/reference/thirdparty/mast3r/mast3r/model.py +
dust3r/model.py:127-196 + catmlp_dpt_head.py:42-123.
"""

import dataclasses
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/thirdparty/mast3r"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent"),
]

H, W = 384, 512


@pytest.fixture(scope="module")
def torch_results():
    """Reference torch ViT-L forward over a fixed pair + its state_dict."""
    for p in [REF, REF + "/dust3r", REF + "/dust3r/croco"]:
        if p not in sys.path:
            sys.path.insert(0, p)
    import torch

    torch.manual_seed(0)
    from mast3r.model import AsymmetricMASt3R

    inf = float("inf")
    model = AsymmetricMASt3R(
        output_mode="pts3d+desc24",
        head_type="catmlp+dpt",
        depth_mode=("exp", -inf, inf),
        conf_mode=("exp", 1, inf),
        desc_conf_mode=("exp", 0, inf),
        two_confs=True,
        landscape_only=False,
        patch_embed_cls="PatchEmbedDust3R",
        img_size=(H, W),
        patch_size=16,
        enc_embed_dim=1024, enc_depth=24, enc_num_heads=16,
        dec_embed_dim=768, dec_depth=12, dec_num_heads=12,
        pos_embed="RoPE100",
    )
    model.eval()

    rng = np.random.default_rng(42)
    img1 = rng.normal(size=(1, 3, H, W)).astype(np.float32) * 0.5
    img2 = (img1 * 0.7 + 0.1).astype(np.float32)

    with torch.no_grad():
        shape = torch.tensor([[H, W]], dtype=torch.int32)
        feat1, pos1, _ = model._encode_image(torch.from_numpy(img1), shape)
        feat2, pos2, _ = model._encode_image(torch.from_numpy(img2), shape)
        dec1, dec2 = model._decoder(feat1, pos1, feat2, pos2)
        res1 = model._downstream_head(1, [t.float() for t in dec1], shape)
        res2 = model._downstream_head(2, [t.float() for t in dec2], shape)

    state = model.state_dict()
    del model
    return {
        "img1": img1, "img2": img2,
        "X1": res1["pts3d"].numpy(), "C1": res1["conf"].numpy(),
        "D1": res1["desc"].numpy(), "Q1": res1["desc_conf"].numpy(),
        "X2": res2["pts3d"].numpy(), "D2": res2["desc"].numpy(),
        "state": state,
    }


@pytest.fixture(scope="module")
def vitl_params(torch_results):
    """f32-STORED conversion: the f32 parity test needs exact weights, and
    the bf16 trunk casts per use with the same rounding as bf16 storage
    (cast_trunk_params docstring), so one conversion serves both tests."""
    import dataclasses

    import jax.numpy as jnp

    from mast3r_slam_tpu.models import mast3r as M
    from mast3r_slam_tpu.models.convert import torch_state_dict_to_params

    cfg32 = dataclasses.replace(M.VIT_LARGE, dtype=jnp.float32)
    return torch_state_dict_to_params(torch_results["state"], cfg32)


def _jax_forward(params, cfg, img1, img2):
    import jax.numpy as jnp

    from mast3r_slam_tpu.models import mast3r as M

    f1, p1 = M.encode_image(params, cfg, jnp.asarray(img1))
    f2, p2 = M.encode_image(params, cfg, jnp.asarray(img2))
    return M.inference_asymmetric(params, cfg, f1, p1, f2, p2, cfg.grid((H, W)))


def test_vitl_fullscale_f32_parity(torch_results, vitl_params):
    """24-block-deep f32 parity at 384x512 — catches any converter/layout bug
    that the tiny config can hide (fc2 permutation, dec_blocks2, RoPE at 768
    tokens, DPT at production grid)."""
    import jax.numpy as jnp

    from mast3r_slam_tpu.models import mast3r as M

    cfg32 = dataclasses.replace(M.VIT_LARGE, dtype=jnp.float32)
    (X1, C1, D1, Q1), (X2, C2, D2, Q2) = _jax_forward(
        vitl_params, cfg32, torch_results["img1"], torch_results["img2"]
    )
    t = torch_results
    np.testing.assert_allclose(np.asarray(X1), t["X1"], atol=5e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(C1), t["C1"], atol=5e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(D1), t["D1"], atol=2e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(Q1), t["Q1"], atol=2e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(X2), t["X2"], atol=5e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(D2), t["D2"], atol=2e-5, rtol=0)


def test_vitl_bf16_trunk_drift_bounded(torch_results, vitl_params):
    """The production trunk runs bf16 (engine.dtype); bound its drift vs the
    reference f32 activations at full scale.  These bounds are the numeric
    contract behind the bf16-trunk default — if an op change blows them up,
    real-data ATE would move too."""
    from mast3r_slam_tpu.models import mast3r as M

    (X1, C1, D1, Q1), _ = _jax_forward(
        vitl_params, M.VIT_LARGE, torch_results["img1"], torch_results["img2"]
    )
    t = torch_results
    assert np.abs(np.asarray(X1) - t["X1"]).max() < 8e-3
    assert np.abs(np.asarray(C1) - t["C1"]).max() < 1e-2
    assert np.abs(np.asarray(D1) - t["D1"]).max() < 8e-2
    # descriptors stay unit-norm and confidences stay >= offset
    assert np.abs(np.linalg.norm(np.asarray(D1), axis=-1) - 1.0).max() < 1e-2
    assert np.asarray(C1).min() >= 1.0


def test_vitl_bf16_heads_drift_bounded(torch_results, vitl_params):
    """The SPEED profile additionally runs the DPT/local-MLP heads in bf16
    (engine.head_dtype, 1-3 ms/frame on v5e).  Measured drift vs torch f32 at
    full scale: X 1.7e-3, C 2.1e-3, D 1.8e-2, Q 2.1e-2 — the same magnitude
    as the bf16 trunk alone.  Bounds carry ~4x margin."""
    import dataclasses

    import jax.numpy as jnp

    from mast3r_slam_tpu.models import mast3r as M

    cfg = dataclasses.replace(M.VIT_LARGE, head_dtype=jnp.bfloat16)
    (X1, C1, D1, Q1), _ = _jax_forward(
        vitl_params, cfg, torch_results["img1"], torch_results["img2"]
    )
    t = torch_results
    assert np.abs(np.asarray(X1) - t["X1"]).max() < 8e-3
    assert np.abs(np.asarray(C1) - t["C1"]).max() < 1e-2
    assert np.abs(np.asarray(D1) - t["D1"]).max() < 8e-2
    assert np.abs(np.asarray(Q1) - t["Q1"]).max() < 1e-1
    assert np.abs(np.linalg.norm(np.asarray(D1), axis=-1) - 1.0).max() < 1e-2


def test_vitl_npz_roundtrip(vitl_params, tmp_path):
    """Full-size converted-checkpoint cache: save/load must be bitwise.

    Uses the PRODUCTION mixed-dtype tree (bf16-stored trunk weights, f32
    norms/biases/heads) — round 2 found np.savez silently writes bf16 as
    void-2 records that cannot be loaded back (models/io.py bf16 tag)."""
    import jax

    from mast3r_slam_tpu.models import mast3r as M
    from mast3r_slam_tpu.models.io import load_params, save_params

    vitl_params = M.cast_trunk_params(vitl_params, M.VIT_LARGE)
    assert any(
        np.asarray(v).dtype == "bfloat16"
        for v in jax.tree_util.tree_leaves(vitl_params)
    ), "production tree should contain bf16 leaves"
    path = tmp_path / "vitl.npz"
    save_params(path, vitl_params)
    loaded = load_params(path)
    flat_a = jax.tree_util.tree_leaves_with_path(vitl_params)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(loaded)}
    assert len(flat_a) == len(flat_b)
    for k, va in flat_a:
        vb = flat_b[jax.tree_util.keystr(k)]
        assert np.asarray(va).dtype == np.asarray(vb).dtype, k
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
