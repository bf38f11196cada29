"""Dense iterative projective matching — XLA implementation.

TPU-native re-design of the reference CUDA matchers
(/root/reference/mast3r_slam/backend/src/matching_kernels.cu):

* ``iter_proj`` (matching_kernels.cu:119-275): per-pixel 2-DoF
  Levenberg-Marquardt alignment of a target ray against a normalized ray
  image.  The CUDA kernel is one thread per pixel; here the whole (B, N)
  pixel grid advances in lock-step inside a ``lax.fori_loop`` — each step is
  two batched bilinear gathers + closed-form 2x2 solves on the VPU, which is
  the natural TPU dataflow (no divergence, full lanes).

* ``refine_matches`` (matching_kernels.cu:26-81): coarse-to-fine local
  descriptor argmax.  One ``lax.scan`` over the 49 window offsets per
  dilation level, batched gather + dot per offset.

The host-side orchestration (ray-image prep, occlusion gating) mirrors
/root/reference/mast3r_slam/matching.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.image import img_gradient


# ---------------------------------------------------------------------------
# bilinear sampling helpers
# ---------------------------------------------------------------------------

def _bilinear_gather(img_flat, W, u, v):
    """Sample (B, H*W, C) image at float coords u, v (B, N) -> (B, N, C).

    Caller guarantees coords are clamped to [1, W-2] x [1, H-2] so all four
    neighbours are in range.
    """
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = (u - u0)[..., None]
    dv = (v - v0)[..., None]
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)

    base = v0 * W + u0

    def take(idx):
        return jnp.take_along_axis(img_flat, idx[..., None], axis=1)

    i00 = take(base)            # (v0, u0)
    i01 = take(base + 1)        # (v0, u0+1)
    i10 = take(base + W)        # (v0+1, u0)
    i11 = take(base + W + 1)    # (v0+1, u0+1)

    return (
        (1 - du) * (1 - dv) * i00
        + du * (1 - dv) * i01
        + (1 - du) * dv * i10
        + du * dv * i11
    )


def _sample_ray_err(rays_flat, W, u, v, target):
    """Sample+normalize ray and return (err, cost, gx, gy)."""
    s = _bilinear_gather(rays_flat, W, u, v)  # (B, N, 9)
    r = s[..., 0:3]
    gx = s[..., 3:6]
    gy = s[..., 6:9]
    r = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
    err = r - target
    cost = jnp.sum(err * err, axis=-1)
    return err, cost, gx, gy


# ---------------------------------------------------------------------------
# iter_proj
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_iter",))
def iter_proj(
    rays_with_grad_img,
    pts3d_norm,
    p_init,
    max_iter: int = 10,
    lambda_init: float = 1e-8,
    cost_thresh: float = 1e-6,
):
    """Vectorised per-pixel LM projective association.

    rays_with_grad_img: (B, H, W, 9)  [unit ray, d/dx, d/dy]
    pts3d_norm:         (B, N, 3)     unit target rays
    p_init:             (B, N, 2)     initial (u, v) guesses
    Returns (p_new (B, N, 2) float32, converged (B, N) bool).
    """
    B, H, W, _ = rays_with_grad_img.shape
    rays_flat = rays_with_grad_img.reshape(B, H * W, 9)

    u = jnp.clip(p_init[..., 0], 1.0, W - 2.0)
    v = jnp.clip(p_init[..., 1], 1.0, H - 2.0)
    lam = jnp.full(u.shape, lambda_init, dtype=u.dtype)
    conv = jnp.zeros(u.shape, dtype=bool)

    def body(_, state):
        u, v, lam, conv = state
        err, cost, gx, gy = _sample_ray_err(rays_flat, W, u, v, pts3d_norm)

        # J^T J (2x2) and -J^T r with LM damping
        A00 = jnp.sum(gx * gx, axis=-1) + lam
        A01 = jnp.sum(gx * gy, axis=-1)
        A11 = jnp.sum(gy * gy, axis=-1) + lam
        b0 = -jnp.sum(err * gx, axis=-1)
        b1 = -jnp.sum(err * gy, axis=-1)

        det = A00 * A11 - A01 * A01
        det_inv = jnp.where(det == 0, 0.0, 1.0 / det)
        du = det_inv * (A11 * b0 - A01 * b1)
        dv = det_inv * (-A01 * b0 + A00 * b1)

        u_new = jnp.clip(u + du, 1.0, W - 2.0)
        v_new = jnp.clip(v + dv, 1.0, H - 2.0)

        _, new_cost, _, _ = _sample_ray_err(rays_flat, W, u_new, v_new, pts3d_norm)

        accept = new_cost < cost
        u = jnp.where(accept, u_new, u)
        v = jnp.where(accept, v_new, v)
        lam = jnp.where(accept, lam * 0.1, lam * 10.0)
        conv = jnp.where(accept, new_cost < cost_thresh, cost < cost_thresh)
        return u, v, lam, conv

    u, v, lam, conv = jax.lax.fori_loop(0, max_iter, body, (u, v, lam, conv))
    return jnp.stack([u, v], axis=-1), conv


# ---------------------------------------------------------------------------
# refine_matches
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("radius", "dilation_max"))
def refine_matches(D11, D21, p1, radius: int = 3, dilation_max: int = 5):
    """Coarse-to-fine descriptor argmax around projected pixels.

    D11: (B, H, W, F) descriptor image of view 1
    D21: (B, N, F)    descriptors of view 2's pixels (predicted in view 1)
    p1:  (B, N, 2)    integer pixel positions to refine
    Returns refined integer positions (B, N, 2) int32.
    """
    B, H, W, F = D11.shape
    D11_flat = D11.reshape(B, H * W, F)

    u = p1[..., 0].astype(jnp.int32)
    v = p1[..., 1].astype(jnp.int32)

    diam = 2 * radius + 1
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.int32)
    offy, offx = jnp.meshgrid(offs, offs, indexing="ij")
    offsets = jnp.stack([offx.reshape(-1), offy.reshape(-1)], axis=-1)  # (diam^2, 2)
    del diam

    neg_inf = jnp.array(-jnp.inf, dtype=D11.dtype)

    def refine_at_dilation(carry, d):
        u0, v0 = carry

        def scan_offset(best, off):
            best_score, best_u, best_v = best
            uu = u0 + off[0] * d
            vv = v0 + off[1] * d
            inside = (uu >= 0) & (uu < W) & (vv >= 0) & (vv < H)
            uc = jnp.clip(uu, 0, W - 1)
            vc = jnp.clip(vv, 0, H - 1)
            idx = vc * W + uc
            cand = jnp.take_along_axis(D11_flat, idx[..., None], axis=1)  # (B,N,F)
            score = jnp.sum(cand * D21, axis=-1)
            score = jnp.where(inside, score, neg_inf)
            better = score > best_score
            return (
                jnp.where(better, score, best_score),
                jnp.where(better, uu, best_u),
                jnp.where(better, vv, best_v),
            ), None

        init = (jnp.full(u0.shape, neg_inf, dtype=D11.dtype), u0, v0)
        (best_score, best_u, best_v), _ = jax.lax.scan(scan_offset, init, offsets)
        return (best_u, best_v), None

    dilations = jnp.arange(dilation_max, 0, -1, dtype=jnp.int32)
    (u, v), _ = jax.lax.scan(refine_at_dilation, (u, v), dilations)
    return jnp.stack([u, v], axis=-1)


# ---------------------------------------------------------------------------
# host-level orchestration (reference matching.py)
# ---------------------------------------------------------------------------

def pixel_to_lin(p, w):
    return p[..., 0] + w * p[..., 1]


def lin_to_pixel(idx, w):
    return jnp.stack([idx % w, idx // w], axis=-1)


def prep_for_iter_proj(X11, X21, idx_1_to_2_init):
    """Build the 9-channel ray image + unit target rays + initial pixels.

    X11/X21: (B, H, W, 3) canonical pointmaps.  Reference matching.py:25-50.
    """
    B, H, W, _ = X11.shape
    rays = X11 / jnp.linalg.norm(X11, axis=-1, keepdims=True)
    rays_chw = jnp.moveaxis(rays, -1, 1)  # (B, 3, H, W)
    gx, gy = img_gradient(rays_chw)
    rays_with_grad = jnp.concatenate(
        [rays_chw, gx, gy], axis=1
    )  # (B, 9, H, W)
    rays_with_grad = jnp.moveaxis(rays_with_grad, 1, -1)  # (B, H, W, 9)

    X21_vec = X21.reshape(B, H * W, 3)
    pts3d_norm = X21_vec / jnp.linalg.norm(X21_vec, axis=-1, keepdims=True)

    if idx_1_to_2_init is None:
        idx_1_to_2_init = jnp.broadcast_to(jnp.arange(H * W, dtype=jnp.int32), (B, H * W))
    p_init = lin_to_pixel(idx_1_to_2_init, W).astype(X11.dtype)
    return rays_with_grad, pts3d_norm, p_init


def match(
    X11,
    X21,
    D11,
    D21,
    idx_1_to_2_init=None,
    *,
    max_iter: int = 10,
    lambda_init: float = 1e-8,
    convergence_thresh: float = 1e-6,
    dist_thresh: float = 1e-1,
    radius: int = 3,
    dilation_max: int = 5,
):
    """Dense 1->2 association (reference matching.py:8-90).

    X11, X21: (B, H, W, 3); D11, D21: (B, H, W, F).
    Returns (idx_1_to_2 (B, N) int32, valid (B, N, 1) bool).
    """
    B, H, W, _ = X11.shape
    rays_with_grad, pts3d_norm, p_init = prep_for_iter_proj(
        X11, X21, idx_1_to_2_init
    )
    p1, valid_proj = iter_proj(
        rays_with_grad,
        pts3d_norm,
        p_init,
        max_iter=max_iter,
        lambda_init=lambda_init,
        cost_thresh=convergence_thresh,
    )
    p1 = p1.astype(jnp.int32)

    # occlusion check: 3D distance between matched points
    X11_flat = X11.reshape(B, H * W, 3)
    idx_lin = pixel_to_lin(p1, W)
    X11_at = jnp.take_along_axis(X11_flat, idx_lin[..., None], axis=1)
    dists = jnp.linalg.norm(X11_at - X21.reshape(B, H * W, 3), axis=-1)
    valid = valid_proj & (dists < dist_thresh)

    if radius > 0:
        p1 = refine_matches(
            D11, D21.reshape(B, H * W, -1), p1, radius=radius, dilation_max=dilation_max
        )

    idx_1_to_2 = pixel_to_lin(p1, W)
    return idx_1_to_2, valid[..., None]
