"""Pallas edge-block kernel == XLA formulation (ray mode).

The kernel (ops/edge_hg_pallas.py) is the TPU-native `ray_align_kernel`
(/root/reference/mast3r_slam/backend/src/gn_kernels.cu:813-1138): rows in
VMEM, one 8x8 accumulator per edge.  On CPU it runs in interpret mode; the
math must match the XLA path to f32 precision, including zero-weight padded
pixels and non-tile-multiple N.
"""

import numpy as np
import jax.numpy as jnp

from mast3r_slam_tpu.ops.global_gn import GlobalGNSettings, gauss_newton_poses

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from test_sharded_ba import _rays_problem


def _solve(impl, args, n_iters=5):
    s = GlobalGNSettings(edge_batch=4, hg_impl=impl, max_iters=n_iters)
    T, it, ok, _ = gauss_newton_poses(*args, s, "rays")
    return np.asarray(T), bool(ok)


def test_pallas_blocks_match_xla():
    # N=300 is NOT a multiple of TILE_N: exercises the zero-weight padding
    gt, noisy, Xs, Cs, ii, jj, idx, valid, Q = _rays_problem(n_kf=5, N=300)
    args = (
        jnp.asarray(noisy), jnp.asarray(Xs), jnp.asarray(Cs),
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(idx),
        jnp.asarray(valid), jnp.asarray(Q),
        jnp.eye(3, dtype=jnp.float32), (1, 1),
    )
    T_ref, ok_ref = _solve("reduce", args)
    T_pal, ok_pal = _solve("pallas", args)
    assert ok_ref and ok_pal
    np.testing.assert_allclose(T_pal, T_ref, rtol=0, atol=1e-5)
    # and it actually solved the problem
    err = np.linalg.norm(T_pal[:, :3] - gt[:, :3], axis=-1).max()
    assert err < 5e-3, err


def test_pallas_ignores_invalid_pixels():
    """valid=False pixels (sq=0) must contribute nothing — set their points
    to garbage and expect identical results."""
    gt, noisy, Xs, Cs, ii, jj, idx, valid, Q = _rays_problem(n_kf=4, N=256)
    valid = valid.copy()
    valid[:, ::3] = False  # kill a third of the pixels
    args_clean = (
        jnp.asarray(noisy), jnp.asarray(Xs), jnp.asarray(Cs),
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(idx),
        jnp.asarray(valid), jnp.asarray(Q),
        jnp.eye(3, dtype=jnp.float32), (1, 1),
    )
    Xs_garbage = Xs.copy()
    Xs_garbage[:, ::3] = 37.0  # garbage where invalid (valid gates by i-idx
    #                            AND j pixel; ::3 stripes hit both)
    T_a, _ = _solve("pallas", args_clean)

    # same invalid mask, garbage points under it: identical solve
    args_g = (
        jnp.asarray(noisy), jnp.asarray(Xs_garbage), jnp.asarray(Cs),
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(idx),
        jnp.asarray(valid), jnp.asarray(Q),
        jnp.eye(3, dtype=jnp.float32), (1, 1),
    )
    T_b, _ = _solve("pallas", args_g)
    # garbage under invalid pixels may still shift f32 sums of VALID terms?
    # No: invalid pixels multiply by sq=0 BEFORE any accumulation.
    np.testing.assert_allclose(T_b, T_a, rtol=0, atol=1e-6)
