"""Numerical parity of the JAX model vs the reference PyTorch stack.

Builds a TINY AsymmetricMASt3R from the (read-only) reference source tree as a
test oracle, converts its random-initialised state_dict with
``convert.torch_state_dict_to_params``, and compares activations end to end.
This is the SURVEY.md §7 M1 parity test, runnable without the pretrained
checkpoint (which is not vendored in this environment).
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/thirdparty/mast3r"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)

H, W = 64, 96


@pytest.fixture(scope="module")
def torch_model():
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
        enc_embed_dim=64,
        enc_depth=2,
        enc_num_heads=2,
        dec_embed_dim=48,
        dec_depth=12,
        dec_num_heads=4,
        pos_embed="RoPE100",
    )
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_model(torch_model):
    from mast3r_slam_tpu.models import mast3r as M
    from mast3r_slam_tpu.models.convert import torch_state_dict_to_params

    params = torch_state_dict_to_params(torch_model.state_dict(), M.VIT_TINY_TEST)
    return params, M.VIT_TINY_TEST


@pytest.fixture(scope="module")
def image(rng_module):
    return rng_module.normal(size=(1, 3, H, W)).astype(np.float32) * 0.5


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(42)


def _torch_encode(torch_model, img_np):
    import torch

    with torch.no_grad():
        shape = torch.tensor([[H, W]], dtype=torch.int32)
        feat, pos, _ = torch_model._encode_image(torch.from_numpy(img_np), shape)
    return feat.numpy(), pos.numpy()


def test_encoder_parity(torch_model, jax_model, image):
    import jax.numpy as jnp

    from mast3r_slam_tpu.models import mast3r as M

    params, cfg = jax_model
    feat_t, pos_t = _torch_encode(torch_model, image)
    feat_j, pos_j = M.encode_image(params, cfg, jnp.asarray(image))
    np.testing.assert_array_equal(np.asarray(pos_j), pos_t)
    np.testing.assert_allclose(np.asarray(feat_j), feat_t, atol=2e-5, rtol=1e-4)


def test_full_inference_parity(torch_model, jax_model, image):
    import jax.numpy as jnp
    import torch

    from mast3r_slam_tpu.models import mast3r as M

    params, cfg = jax_model

    img2 = image[::-1].copy() if image.shape[0] > 1 else (image * 0.7 + 0.1)
    feat1_t, pos1_t = _torch_encode(torch_model, image)
    feat2_t, pos2_t = _torch_encode(torch_model, img2)

    with torch.no_grad():
        dec1, dec2 = torch_model._decoder(
            torch.from_numpy(feat1_t),
            torch.from_numpy(pos1_t),
            torch.from_numpy(feat2_t),
            torch.from_numpy(pos2_t),
        )
        shape = torch.tensor([[H, W]], dtype=torch.int32)
        res1 = torch_model._downstream_head(1, [t.float() for t in dec1], shape)
        res2 = torch_model._downstream_head(2, [t.float() for t in dec2], shape)

    feat1_j, pos1_j = M.encode_image(params, cfg, jnp.asarray(image))
    feat2_j, pos2_j = M.encode_image(params, cfg, jnp.asarray(img2))
    (X1, C1, D1, Q1), (X2, C2, D2, Q2) = M.inference_asymmetric(
        params, cfg, feat1_j, pos1_j, feat2_j, pos2_j, cfg.grid((H, W))
    )

    np.testing.assert_allclose(
        np.asarray(X1), res1["pts3d"].numpy(), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(C1), res1["conf"].numpy(), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(D1), res1["desc"].numpy(), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(Q1), res1["desc_conf"].numpy(), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(X2), res2["pts3d"].numpy(), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(D2), res2["desc"].numpy(), atol=1e-4, rtol=1e-3
    )


def test_portrait_grid_parity(torch_model, jax_model, rng_module):
    """Portrait aspect (H > W): grid/rope/head plumbing must still match."""
    import jax.numpy as jnp
    import torch

    from mast3r_slam_tpu.models import mast3r as M

    params, cfg = jax_model
    Hp, Wp = 96, 64
    img = rng_module.normal(size=(1, 3, Hp, Wp)).astype(np.float32) * 0.5
    with torch.no_grad():
        shape = torch.tensor([[Hp, Wp]], dtype=torch.int32)
        feat_t, pos_t, _ = torch_model._encode_image(torch.from_numpy(img), shape)
        dec1, dec2 = torch_model._decoder(feat_t, pos_t, feat_t, pos_t)
        res1 = torch_model._downstream_head(1, [t.float() for t in dec1], shape)

    feat_j, pos_j = M.encode_image(params, cfg, jnp.asarray(img))
    np.testing.assert_array_equal(np.asarray(pos_j), pos_t.numpy())
    (X1, C1, D1, Q1), _ = M.inference_asymmetric(
        params, cfg, feat_j, pos_j, feat_j, pos_j, cfg.grid((Hp, Wp))
    )
    np.testing.assert_allclose(
        np.asarray(X1), res1["pts3d"].numpy(), atol=1e-3, rtol=1e-3
    )


def test_layer_norm_dot_stats_matches_twopass():
    """engine.ln_stats=dot must match the default two-pass LN to f32
    sum-reorder noise (same centered math, reductions on the MXU)."""
    import jax.numpy as jnp

    from mast3r_slam_tpu.models import layers as L

    rng = np.random.default_rng(3)
    # offset + scale stress the reduction (non-zero mean, mixed magnitudes)
    x = jnp.asarray(rng.normal(2.0, 5.0, size=(2, 768, 1024)).astype(np.float32))
    p = {
        "w": jnp.asarray(rng.normal(1.0, 0.1, size=(1024,)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(0.0, 0.1, size=(1024,)).astype(np.float32)),
    }
    ref = np.asarray(L.layer_norm(p, x))
    L.set_ln_stats("dot")
    try:
        out = np.asarray(L.layer_norm(p, x))
    finally:
        L.set_ln_stats("twopass")
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)
    # bf16 inputs (trunk dtype) round-trip through the same path
    ref16 = np.asarray(L.layer_norm(p, x.astype(jnp.bfloat16)), dtype=np.float32)
    L.set_ln_stats("dot")
    try:
        out16 = np.asarray(
            L.layer_norm(p, x.astype(jnp.bfloat16)), dtype=np.float32
        )
    finally:
        L.set_ln_stats("twopass")
    np.testing.assert_allclose(out16, ref16, atol=5e-2, rtol=5e-2)
