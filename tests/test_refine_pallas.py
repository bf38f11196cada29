"""Pallas radius-1 refinement kernel == XLA refine_matches (interpret mode).

The TPU A/B lives in scripts/tpu_r4_experiments.py (refine1 section); this
pins the kernel's SEMANTICS on CPU: identical refined indices to
`refine_matches(radius=1, dilation_max=1)` on the same quantised
descriptors, including image-border masking and argmax tie order."""

import numpy as np
import jax.numpy as jnp

from mast3r_slam_tpu.ops.matching import pixel_to_lin, refine_matches
from mast3r_slam_tpu.ops.refine_pallas import refine_r1_pallas


def _quant(x):
    return jnp.clip(jnp.round(x * 127.0), -127, 127).astype(jnp.int8)


def _case(rng, B, H, W, F, structured=False):
    D11 = rng.normal(size=(B, H, W, F)).astype(np.float32)
    if structured:
        # make neighbourhoods correlated so the argmax is non-trivial
        D11 = (
            D11
            + np.roll(D11, 1, axis=2) * 0.7
            + np.roll(D11, 1, axis=1) * 0.5
        )
    D11 /= np.linalg.norm(D11, axis=-1, keepdims=True)
    N = H * W
    # targets: true descriptor at a shifted location + noise
    shift = rng.integers(-1, 2, size=(B, N, 2))
    u = np.clip(np.arange(N) % W + shift[..., 0], 0, W - 1)
    v = np.clip(np.arange(N) // W + shift[..., 1], 0, H - 1)
    D21 = np.stack([D11[b].reshape(N, F)[v[b] * W + u[b]] for b in range(B)])
    D21 = D21 + rng.normal(size=D21.shape).astype(np.float32) * 0.05
    idx0 = np.tile(np.arange(N, dtype=np.int32), (B, 1))
    return jnp.asarray(D11), jnp.asarray(D21), jnp.asarray(idx0)


def test_matches_xla_refine_r1():
    rng = np.random.default_rng(0)
    B, H, W, F = 2, 8, 16, 24  # N=128 (lane-aligned)
    D11, D21, idx = _case(rng, B, H, W, F, structured=True)
    p = jnp.stack([idx % W, idx // W], axis=-1).astype(jnp.int32)

    p_ref = refine_matches(D11, D21, p, radius=1, dilation_max=1)
    idx_ref = pixel_to_lin(p_ref, W)

    got = refine_r1_pallas(
        _quant(D11.reshape(B, H * W, F)), _quant(D21), idx,
        H, W, tile_n=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(idx_ref))


def test_border_and_tiles():
    rng = np.random.default_rng(3)
    B, H, W, F = 1, 16, 32, 8  # N=512: multiple 128-tiles
    D11, D21, idx = _case(rng, B, H, W, F)
    # push some current matches onto the border so masking matters
    idx = idx.at[0, :64].set(jnp.arange(64, dtype=jnp.int32))  # top row
    p = jnp.stack([idx % W, idx // W], axis=-1).astype(jnp.int32)

    p_ref = refine_matches(D11, D21, p, radius=1, dilation_max=1)
    idx_ref = pixel_to_lin(p_ref, W)
    got = refine_r1_pallas(
        _quant(D11.reshape(B, H * W, F)), _quant(D21), idx,
        H, W, tile_n=256, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(idx_ref))
