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


_EXP_SQUARINGS = 7  # argument scaled by 2^-7 = 1/128 before the Taylor leg


def exp(xi):
    """Sim(3) exponential map: tangent (..., 7) -> transform (..., 8).

    Computed by SCALING AND SQUARING rather than the closed-form
    W-coefficient branches the reference uses (gn_kernels.cu:324-392,
    Sophus-style).  Those formulas are only conditionally stable: for
    0 < |sigma| or theta below ~1e-2 the "general" branches divide an
    O(eps)-cancelled numerator by sigma^2 / sigma^3 / theta*c — fine in the
    reference's f64, CATASTROPHIC in f32.  Measured (r4 retrprobe, real GN
    steps): at sigma=2.9e-6, theta=8.7e-4, |tau|=1.2e-3 the branch formula's
    translation was off by 0.94 — an 800x blow-up that made every Sim(3) GN
    loop on TPU (and, less often, CPU) chase its own retraction damage;
    this was the true root cause of the r3 "PCG diverges on-chip" issue.

    Scaling-and-squaring is uniformly stable: the 3rd-order Taylor of the
    translation integral V = sum_{m,n} sigma^m [phi]x^n / (m! n! (m+n+1))
    is exact to <1e-6 relative once (sigma, theta) are scaled under ~0.03
    (tau enters LINEARLY — only the rotation/scale arguments need to be
    small), and each of the 7 squarings is an exact group composition
    (elementwise quaternion algebra).  Rotation and scale of the FULL
    argument are taken from the exact quaternion/exp forms, which are
    stable at every magnitude.
    """
    tau = xi[..., 0:3]
    phi = xi[..., 3:6]
    sigma = xi[..., 6:7]

    f = 1.0 / (1 << _EXP_SQUARINGS)
    ts = tau * f
    ps = phi * f
    ss = sigma * f
    th2 = jnp.sum(ps * ps, axis=-1, keepdims=True)

    # V-series coefficients to combined 3rd order in (sigma, theta)
    C = 1.0 + ss * (0.5 + ss * (1.0 / 6.0 + ss / 24.0))
    A = (
        0.5
        + ss * (1.0 / 3.0 + ss * (0.125 + ss / 30.0))
        - th2 * (1.0 / 24.0 + ss / 30.0)
    )
    B = (
        1.0 / 6.0
        + ss * (0.125 + ss * (1.0 / 20.0 + ss / 72.0))
        - th2 * (1.0 / 120.0 + ss / 144.0)
    )
    pxt = jnp.cross(ps, ts)
    t = C * ts + A * pxt + B * jnp.cross(ps, pxt)

    T = make(t, exp_so3_quat(ps), jnp.exp(ss))
    for _ in range(_EXP_SQUARINGS):
        T = mul(T, T)
    # exact rotation/scale at the full argument; squaring supplies only t
    return make(t_of(T), exp_so3_quat(phi), jnp.exp(sigma))


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
    nv = jnp.sqrt(jnp.sum(qv * qv, axis=-1, keepdims=True))  # VPU-exact
    small = nv < _EPS
    nv_safe = jnp.where(small, 1.0, nv)
    # atan2 handles qw<0 (double cover)
    angle = 2.0 * jnp.arctan2(nv, qw)
    # wrap to (-pi, pi]
    angle = jnp.where(angle > jnp.pi, angle - 2.0 * jnp.pi, angle)
    k = jnp.where(small, 2.0 / jnp.where(qw == 0, 1.0, qw), angle / nv_safe)
    phi = k * qv

    sigma = jnp.log(s)

    # W(phi, sigma) built COLUMN-WISE from the stable exponential: the
    # translation of exp([e_i; phi; sigma]) is exactly W e_i, so the
    # scaling-and-squaring path (see exp) gives a W free of the f32
    # W-coefficient cancellation; the 3x3 solve is well-conditioned
    # (cond(W) ~ O(1) for |sigma| bounded).
    batch = phi.shape[:-1]
    cols = []
    for i in range(3):
        e = jnp.zeros(batch + (3,), dtype=T.dtype).at[..., i].set(1.0)
        cols.append(t_of(exp(jnp.concatenate([e, phi, sigma], axis=-1))))
    W = jnp.stack(cols, axis=-1)  # (..., 3, 3), columns W e_i
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
    q = q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))  # VPU-exact
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
