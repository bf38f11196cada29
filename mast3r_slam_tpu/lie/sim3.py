"""Sim(3) Lie group on JAX arrays.

A transform is stored as a flat 8-vector ``[tx ty tz, qx qy qz qw, s]``
(translation, unit quaternion, positive scale).  This is the same embedded
parameterisation the reference system uses (lietorch ``Sim3.embedded_dim == 8``;
see /root/reference/mast3r_slam/frame.py:239 and the CUDA device math in
/root/reference/mast3r_slam/backend/src/gn_kernels.cu:178-413, which this module
replaces with pure-jnp, vmappable functions).

All functions broadcast over arbitrary leading batch dimensions and are safe
under ``jit``/``vmap``/``scan``.  Tangent vectors are ordered
``[tau(3), phi(3), sigma]`` (translation, rotation, log-scale), matching the
7-DoF ordering of the reference solvers.

No gradients are required through these ops (the solvers use analytic
Jacobians), so small-angle branches use plain ``jnp.where`` with guarded
denominators.
"""

from __future__ import annotations

import jax.numpy as jnp

DIM = 8  # embedded dimension: t(3) + q(4) + s(1)
TANGENT_DIM = 7  # tau(3) + phi(3) + sigma(1)

_EPS = 1e-6


# ---------------------------------------------------------------------------
# quaternion helpers (x, y, z, w convention)
# ---------------------------------------------------------------------------

def quat_mul(qa, qb):
    """Hamilton product qa * qb, (..., 4) in xyzw order."""
    ax, ay, az, aw = jnp.moveaxis(qa, -1, 0)
    bx, by, bz, bw = jnp.moveaxis(qb, -1, 0)
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_inv(q):
    """Conjugate of a unit quaternion."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_act(q, v):
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4).

    Uses the 2-cross-product form (no matrix materialisation), which is what
    the VPU vectorises best.
    """
    qv = q[..., :3]
    qw = q[..., 3:4]
    uv = 2.0 * jnp.cross(qv, v)
    return v + qw * uv + jnp.cross(qv, uv)


def quat_to_matrix(q):
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# Sim(3) accessors
# ---------------------------------------------------------------------------

def t_of(T):
    return T[..., 0:3]


def q_of(T):
    return T[..., 3:7]


def s_of(T):
    return T[..., 7:8]


def make(t, q, s):
    return jnp.concatenate([t, q, s], axis=-1)


def identity(batch_shape=(), dtype=jnp.float32):
    base = jnp.asarray([0, 0, 0, 0, 0, 0, 1, 1], dtype=dtype)
    return jnp.broadcast_to(base, tuple(batch_shape) + (DIM,))


# ---------------------------------------------------------------------------
# group operations
# ---------------------------------------------------------------------------

def act(T, X):
    """Apply T (..., 8) to points X (..., 3): s * R @ X + t.

    Leading dims of T must broadcast against leading dims of X; to transform a
    pointcloud with one pose, pass T of shape (8,) and X of shape (N, 3).
    """
    return s_of(T) * quat_act(q_of(T), X) + t_of(T)


def mul(Ta, Tb):
    """Compose: (Ta * Tb)(x) = Ta(Tb(x))."""
    q = quat_mul(q_of(Ta), q_of(Tb))
    t = s_of(Ta) * quat_act(q_of(Ta), t_of(Tb)) + t_of(Ta)
    s = s_of(Ta) * s_of(Tb)
    return make(t, q, s)


def inv(T):
    """Inverse transform."""
    qi = quat_inv(q_of(T))
    si = 1.0 / s_of(T)
    ti = -si * quat_act(qi, t_of(T))
    return make(ti, qi, si)


def rel(Ti, Tj):
    """Relative transform T_ij = Ti^-1 * Tj (cf. relSim3, gn_kernels.cu:253)."""
    si_inv = 1.0 / s_of(Ti)
    qi_inv = quat_inv(q_of(Ti))
    qij = quat_mul(qi_inv, q_of(Tj))
    tij = si_inv * quat_act(qi_inv, t_of(Tj) - t_of(Ti))
    sij = si_inv * s_of(Tj)
    return make(tij, qij, sij)


def matrix(T):
    """(..., 8) -> homogeneous (..., 4, 4) with sR in the upper-left block."""
    R = quat_to_matrix(q_of(T))
    sR = s_of(T)[..., None] * R
    t = t_of(T)[..., None]
    top = jnp.concatenate([sR, t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# exponential map / retraction
# ---------------------------------------------------------------------------

def exp_so3_quat(phi):
    """SO(3) exponential map to a quaternion, (..., 3) -> (..., 4) xyzw."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta_sq)
    small = theta_sq < _EPS
    theta_safe = jnp.where(small, 1.0, theta)
    theta_p4 = theta_sq * theta_sq
    imag = jnp.where(
        small,
        0.5 - theta_sq / 48.0 + theta_p4 / 3840.0,
        jnp.sin(0.5 * theta) / theta_safe,
    )
    real = jnp.where(
        small,
        1.0 - theta_sq / 8.0 + theta_p4 / 384.0,
        jnp.cos(0.5 * theta),
    )
    return jnp.concatenate([imag * phi, real], axis=-1)


def _sim3_W_coefficients(theta_sq, theta, sigma, scale):
    """(C, A, B) such that t = (C I + A [phi]x + B [phi]x^2) tau.

    Mirrors the rxso3 W-coefficient series selected by the reference solver
    (gn_kernels.cu:324-392); four analytic branches blended with where.
    """
    one = jnp.ones_like(sigma)
    small_sigma = jnp.abs(sigma) < _EPS
    small_theta = theta_sq < _EPS

    theta_safe = jnp.where(small_theta, 1.0, theta)
    sigma_safe = jnp.where(small_sigma, 1.0, sigma)
    sigma_sq = sigma * sigma

    # sigma ~ 0 branches
    A_ss = jnp.where(
        small_theta,
        0.5 * one,
        (1.0 - jnp.cos(theta)) / jnp.where(small_theta, 1.0, theta_sq),
    )
    B_ss = jnp.where(
        small_theta,
        one / 6.0,
        (theta - jnp.sin(theta)) / jnp.where(small_theta, 1.0, theta_sq * theta_safe),
    )
    C_ss = one

    # general sigma branches
    C_gs = (scale - 1.0) / sigma_safe
    A_gs_smalltheta = ((sigma - 1.0) * scale + 1.0) / jnp.where(small_sigma, 1.0, sigma_sq)
    B_gs_smalltheta = (scale * 0.5 * sigma_sq + scale - 1.0 - sigma * scale) / jnp.where(
        small_sigma, 1.0, sigma_sq * sigma_safe
    )
    a = scale * jnp.sin(theta)
    b = scale * jnp.cos(theta)
    c = theta_sq + sigma_sq
    c_safe = jnp.where(c == 0.0, 1.0, c)
    A_gs_gen = (a * sigma + (1.0 - b) * theta) / (theta_safe * c_safe)
    B_gs_gen = (C_gs - ((b - 1.0) * sigma + a * theta) / c_safe) / jnp.where(
        small_theta, 1.0, theta_sq
    )
    A_gs = jnp.where(small_theta, A_gs_smalltheta, A_gs_gen)
    B_gs = jnp.where(small_theta, B_gs_smalltheta, B_gs_gen)

    C = jnp.where(small_sigma, C_ss, C_gs)
    A = jnp.where(small_sigma, A_ss, A_gs)
    B = jnp.where(small_sigma, B_ss, B_gs)
    return C, A, B


def exp(xi):
    """Sim(3) exponential map: tangent (..., 7) -> transform (..., 8)."""
    tau = xi[..., 0:3]
    phi = xi[..., 3:6]
    sigma = xi[..., 6:7]

    scale = jnp.exp(sigma)
    q = exp_so3_quat(phi)

    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta_sq)
    C, A, B = _sim3_W_coefficients(theta_sq, theta, sigma, scale)

    phixtau = jnp.cross(phi, tau)
    phixphixtau = jnp.cross(phi, phixtau)
    t = C * tau + A * phixtau + B * phixphixtau
    return make(t, q, scale)


def log(T):
    """Sim(3) logarithm: transform (..., 8) -> tangent (..., 7).

    Inverse of :func:`exp`; W is inverted by solving the same 3x3 system.
    """
    q = q_of(T)
    s = s_of(T)
    t = t_of(T)

    # SO(3) log from quaternion
    qv = q[..., :3]
    qw = q[..., 3:4]
    nv = jnp.linalg.norm(qv, axis=-1, keepdims=True)
    small = nv < _EPS
    nv_safe = jnp.where(small, 1.0, nv)
    # atan2 handles qw<0 (double cover)
    angle = 2.0 * jnp.arctan2(nv, qw)
    # wrap to (-pi, pi]
    angle = jnp.where(angle > jnp.pi, angle - 2.0 * jnp.pi, angle)
    k = jnp.where(small, 2.0 / jnp.where(qw == 0, 1.0, qw), angle / nv_safe)
    phi = k * qv

    sigma = jnp.log(s)
    scale = s

    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta_sq)
    C, A, B = _sim3_W_coefficients(theta_sq, theta, sigma, scale)

    # W = C I + A [phi]x + B [phi]x^2 ; solve W tau = t in closed form via
    # the basis {t, phi x t, phi x (phi x t)}: W^-1 = a I + b [phi]x + c [phi]x^2
    # with coefficients from the 3x3 system on the invariant subspace.
    # Simple and robust: build the 3x3 matrix and solve.
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), phi.shape[:-1] + (3, 3))
    px = _skew(phi)
    W = C[..., None] * eye + A[..., None] * px + B[..., None] * (px @ px)
    tau = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([tau, phi, sigma], axis=-1)


def _skew(v):
    x, y, z = jnp.moveaxis(v, -1, 0)
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def retr(T, xi):
    """Left retraction exp(xi) * T (cf. retrSim3, gn_kernels.cu:393-413)."""
    return mul(exp(xi), T)


def normalize(T):
    """Re-normalise the quaternion block (drift control in long scans)."""
    q = q_of(T)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return make(t_of(T), q, s_of(T))


# ---------------------------------------------------------------------------
# adjoint application used by the BA kernels
# ---------------------------------------------------------------------------

def apply_adj_inv(T, x):
    """Row-vector adjoint-inverse application (gn_kernels.cu:278-299).

    Maps a local (camera-frame) Jacobian row x = [a(3), b(3), c] to the
    world-frame tangent row used by the pose-graph solver:
      y[0:3] = s^-1 R a
      y[3:6] = s^-1 [t]x (R a) + R b
      y[6]   = c + s^-1 t . (R a)
    Broadcasts over leading dims; x is (..., 7).
    """
    t = t_of(T)
    q = q_of(T)
    s_inv = 1.0 / s_of(T)
    a = x[..., 0:3]
    b = x[..., 3:6]
    c = x[..., 6:7]
    Ra = quat_act(q, a)
    Rb = quat_act(q, b)
    y0 = s_inv * Ra
    y1 = Rb + s_inv * jnp.cross(t, Ra)
    y2 = c + s_inv * jnp.sum(t * Ra, axis=-1, keepdims=True)
    return jnp.concatenate([y0, y1, y2], axis=-1)


# ---------------------------------------------------------------------------
# export helpers
# ---------------------------------------------------------------------------

def to_se3(T):
    """Drop the scale to produce an SE(3)-style [t, q] 7-vector.

    Mirrors the reference trajectory export (lietorch_utils.py:6-13): the
    translation keeps the scaled value, only the similarity scale is dropped.
    """
    return T[..., 0:7]
