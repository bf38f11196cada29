"""Projective geometry with analytic Jacobians, pure jnp.

Replicates the math of /root/reference/mast3r_slam/geometry.py (ray/dist
residual terms, pinhole projection with log-depth, backprojection) in a form
XLA fuses well: every function is batched over pixels and jit/vmap-safe, and
the Jacobian variants return stacked (..., rows, cols) arrays that feed the
Gauss-Newton einsum assembly directly.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..lie import sim3
from ..utils.numerics import vnorm


def skew(v):
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def point_to_dist(X):
    return vnorm(X)  # VPU-exact, never an MXU dot (utils.numerics)


def tau_jacobian(dres_dY, Y):
    """Chain a residual Jacobian through the Sim(3) action: d(res)/d(tau).

    For a left perturbation exp(tau)·T acting on points, dY/dtau has the
    structured form [I | -skew(Y) | Y] at Y = T·X, so the chain rule
    J = dres_dY @ dY/dtau expands row-wise to [a | Y x a | a·Y] — three fused
    VPU ops instead of a per-pixel (R,3)x(3,7) matmul (batched tiny matmuls
    lower very poorly on TPU; measured ~2 ms/GN-iteration at 384x512).

    dres_dY: (..., R, 3); Y: (..., 3).  Returns (..., R, 7).
    """
    Yb = Y[..., None, :]
    rot = jnp.cross(Yb, dres_dY)
    scale = jnp.sum(dres_dY * Yb, axis=-1, keepdims=True)
    return jnp.concatenate([dres_dY, rot, scale], axis=-1)


def point_to_ray_dist(X, jacobian: bool = False):
    """(..., 3) -> (..., 4) [unit ray, distance]; optionally d(rd)/dX (..., 4, 3).

    Reference: geometry.py:17-34.
    """
    d = point_to_dist(X)
    d_inv = 1.0 / d
    r = d_inv * X
    rd = jnp.concatenate([r, d], axis=-1)
    if not jacobian:
        return rd
    d_inv_2 = d_inv * d_inv
    eye = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), X.shape[:-1] + (3, 3))
    outer = X[..., :, None] * X[..., None, :]
    dr_dX = d_inv[..., None] * (eye - d_inv_2[..., None] * outer)
    dd_dX = r[..., None, :]
    return rd, jnp.concatenate([dr_dX, dd_dX], axis=-2)


def act_sim3(T, X, jacobian: bool = False):
    """Transform points and optionally d(TX)/d(tau) (..., 3, 7).

    Tangent column order [t(3), phi(3), sigma] for a LEFT perturbation
    exp(eps) * T, evaluated at the transformed point: [I, -skew(TX), TX].
    Reference: geometry.py:45-52.
    """
    Y = sim3.act(T, X)
    if not jacobian:
        return Y
    eye = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), Y.shape[:-1] + (3, 3))
    J = jnp.concatenate([eye, -skew(Y), Y[..., :, None]], axis=-1)
    return Y, J


def decompose_K(K):
    return K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2]


def project_calib(
    P,
    K,
    img_size,
    jacobian: bool = False,
    border: float = 0.0,
    z_eps: float = 0.0,
):
    """Pinhole projection to (u, v, log z) with validity mask.

    P: (..., 3) camera-frame points.  K: (3, 3).  img_size: (H, W) static.
    Returns pz (..., 3), [dpz_dP (..., 3, 3)], valid (..., 1) bool.
    Reference: geometry.py:63-105.
    """
    H, W = img_size
    fx, fy, cx, cy = decompose_K(K)
    x = P[..., 0]
    y = P[..., 1]
    z = P[..., 2]
    valid_z = z > z_eps
    z_safe = jnp.where(valid_z, z, 1.0)
    z_inv = 1.0 / z_safe
    u = fx * x * z_inv + cx
    v = fy * y * z_inv + cy

    valid_u = (u > border) & (u < W - 1 - border)
    valid_v = (v > border) & (v < H - 1 - border)
    valid = (valid_u & valid_v & valid_z)[..., None]

    logz = jnp.where(valid_z, jnp.log(z_safe), 0.0)
    pz = jnp.stack([u, v, logz], axis=-1)
    if not jacobian:
        return pz, valid

    zero = jnp.zeros_like(z_inv)
    row_u = jnp.stack([fx * z_inv, zero, -fx * x * z_inv * z_inv], axis=-1)
    row_v = jnp.stack([zero, fy * z_inv, -fy * y * z_inv * z_inv], axis=-1)
    row_z = jnp.stack([zero, zero, z_inv], axis=-1)
    dpz_dP = jnp.stack([row_u, row_v, row_z], axis=-2)
    return pz, dpz_dP, valid


def backproject(p, z, K):
    """Pixels (..., 2) + depth (..., 1) -> camera points (..., 3).

    Reference: geometry.py:107-115.
    """
    x = (p[..., 0] - K[0, 2]) / K[0, 0]
    y = (p[..., 1] - K[1, 2]) / K[1, 1]
    dirs = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return z * dirs


def get_pixel_coords(img_size, dtype=jnp.float32):
    """(H, W) -> (H, W, 2) of (u, v) pixel coordinates."""
    H, W = img_size
    u = jnp.arange(W, dtype=dtype)
    v = jnp.arange(H, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    return jnp.stack([uu, vv], axis=-1)


def constrain_points_to_ray(img_size, Xs, K):
    """Snap a (H*W, 3) pointmap onto the calibrated pixel rays, keeping z.

    Reference: geometry.py:37-42.
    """
    H, W = img_size
    uv = get_pixel_coords(img_size, dtype=Xs.dtype).reshape(-1, 2)
    uv = jnp.broadcast_to(uv, Xs.shape[:-1] + (2,))
    return backproject(uv, Xs[..., 2:3], K)
