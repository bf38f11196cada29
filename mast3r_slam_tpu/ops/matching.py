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

def _bilinear_gather(img_hw, u, v):
    """Sample (B, H, W, C) image at float coords u, v (B, N) -> (B, N, C).

    Caller guarantees coords are clamped to [1, W-2] x [1, H-2] so all four
    neighbours are in range.  The 2x2 neighbourhood is fetched as ONE
    slice-gather (vmapped dynamic_slice) — contiguous 2-row DMA descriptors
    instead of 4 independent row gathers, which is the difference between
    DMA-bound and latency-bound on TPU.
    """
    C = img_hw.shape[-1]
    u0f = jnp.floor(u)
    v0f = jnp.floor(v)
    du = (u - u0f)[..., None]
    dv = (v - v0f)[..., None]
    u0 = u0f.astype(jnp.int32)
    v0 = v0f.astype(jnp.int32)

    def slice_one(img, vv, uu):
        z = jnp.zeros((), dtype=vv.dtype)
        return jax.lax.dynamic_slice(img, (vv, uu, z), (2, 2, C))

    # vmap over pixels then batch: (B, N, 2, 2, C)
    patches = jax.vmap(jax.vmap(slice_one, in_axes=(None, 0, 0)))(img_hw, v0, u0)
    w00 = (1 - du) * (1 - dv)
    w01 = du * (1 - dv)
    w10 = (1 - du) * dv
    w11 = du * dv
    return (
        w00 * patches[:, :, 0, 0]
        + w01 * patches[:, :, 0, 1]
        + w10 * patches[:, :, 1, 0]
        + w11 * patches[:, :, 1, 1]
    )


def _sample_ray_err(rays_hw, u, v, target):
    """Sample+normalize ray and return (err, cost, gx, gy)."""
    s = _bilinear_gather(rays_hw, u, v)  # (B, N, 9)
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

    u = jnp.clip(p_init[..., 0], 1.0, W - 2.0)
    v = jnp.clip(p_init[..., 1], 1.0, H - 2.0)
    lam = jnp.full(u.shape, lambda_init, dtype=u.dtype)
    conv = jnp.zeros(u.shape, dtype=bool)

    def body(_, state):
        u, v, lam, conv = state
        err, cost, gx, gy = _sample_ray_err(rays_with_grad_img, u, v, pts3d_norm)

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

        _, new_cost, _, _ = _sample_ray_err(
            rays_with_grad_img, u_new, v_new, pts3d_norm
        )

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

    TPU shape: per dilation level the (2r+1)^2 window is fetched as 2r+1
    CONTIGUOUS row segments per pixel (one slice-gather each) from a
    zero-padded descriptor image, instead of 49 independent point gathers —
    slice rows are multi-KB DMA descriptors, which moves this op from
    latency-bound to bandwidth-bound.  Outside-image candidates are masked
    to -inf exactly as the CUDA kernel does (matching_kernels.cu:50-58).
    """
    B, H, W, F = D11.shape
    diam = 2 * radius + 1

    # half precision descriptors, as the reference (matching.py:79 D.half())
    D11 = D11.astype(jnp.bfloat16)
    D21 = D21.astype(jnp.bfloat16)

    max_rd = radius * dilation_max
    Dpad = jnp.pad(D11, ((0, 0), (max_rd, max_rd), (max_rd, max_rd), (0, 0)))

    u0 = p1[..., 0].astype(jnp.int32)
    v0 = p1[..., 1].astype(jnp.int32)
    neg_inf = jnp.array(-jnp.inf, dtype=jnp.float32)

    for d in range(dilation_max, 0, -1):
        rd = radius * d
        seg = 2 * rd + 1

        best_score = jnp.full(u0.shape, neg_inf, dtype=jnp.float32)
        best_u, best_v = u0, v0
        u_start = (u0 - rd + max_rd).astype(jnp.int32)  # padded coords

        def row_slice(img, vv, uu):
            z = jnp.zeros((), dtype=vv.dtype)
            return jax.lax.dynamic_slice(img, (vv, uu, z), (1, seg, F))[0]

        gather_rows = jax.vmap(jax.vmap(row_slice, in_axes=(None, 0, 0)))

        for iy in range(diam):
            dy = (iy - radius) * d
            vv = v0 + dy
            rows = gather_rows(Dpad, (vv + max_rd).astype(jnp.int32), u_start)  # (B, N, seg, F)
            cand = rows[:, :, ::d, :]  # (B, N, diam, F)
            scores = jnp.einsum(
                "bnkf,bnf->bnk", cand, D21, preferred_element_type=jnp.float32
            )
            ux = u0[..., None] + (jnp.arange(diam, dtype=jnp.int32) - radius) * d
            inside = (
                (ux >= 0) & (ux < W) & (vv[..., None] >= 0) & (vv[..., None] < H)
            )
            scores = jnp.where(inside, scores, neg_inf)
            k = jnp.argmax(scores, axis=-1)
            s = jnp.take_along_axis(scores, k[..., None], axis=-1)[..., 0]
            better = s > best_score
            best_score = jnp.where(better, s, best_score)
            best_u = jnp.where(better, u0 + (k - radius) * d, best_u)
            best_v = jnp.where(better, vv, best_v)

        u0, v0 = best_u, best_v

    return jnp.stack([u0, v0], axis=-1)


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
