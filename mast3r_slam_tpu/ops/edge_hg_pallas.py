"""Pallas TPU kernel: per-edge ray+distance GN blocks in one fused pass.

The TPU-native equivalent of the reference's hottest backend kernel
(`ray_align_kernel`, /root/reference/mast3r_slam/backend/src/gn_kernels.cu:813-1138):
per pixel, build the 4 residual rows of the ray+distance objective and
accumulate the weighted 8x8 normal-equation block [J|err]ᵀW[J|err] per edge.

Why a kernel: the XLA formulation measures ~2.6 ms per edge per GN iteration
at 384x512 (BASELINE.md r3) — ~100x off the bandwidth floor — because the
Jacobian rows materialise in HBM whichever way the reduction is phrased
(matmul operands or reduce inputs).  The CUDA reference keeps rows in
registers and accumulates in shared memory; here rows live in VMEM
(registers at the Mosaic level), the only HBM traffic is the inputs
(Xi, Xj, sq ≈ 28 B/pixel) and an (8, 128) accumulator per edge.

Layout: channel-major (E, 3, N) inputs so the pixel axis is the 128-lane
axis; pixels tile at TILE_N per grid step; the (8, 8) block accumulates in
the output block across the pixel-tile grid dimension (sequential on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 512


def _kernel(tij_ref, xi_ref, xj_ref, sq_ref, out_ref, *,
            sigma_ray: float, sigma_dist: float, huber_k: float):
    t = pl.program_id(1)

    # per-edge Sim3 scalars from a (1, 1, 128) VMEM block (an SMEM
    # scalar-prefetch of the whole (E, 8) array overflows the 1 MB SMEM at
    # large E; a (1, 8) SMEM/VMEM block violates the (8, 128) lowering
    # rule): [tx ty tz qx qy qz qw s] in lanes 0..7
    tx, ty, tz = tij_ref[0, 0, 0], tij_ref[0, 0, 1], tij_ref[0, 0, 2]
    qx, qy, qz = tij_ref[0, 0, 3], tij_ref[0, 0, 4], tij_ref[0, 0, 5]
    qw, s = tij_ref[0, 0, 6], tij_ref[0, 0, 7]

    xi0, xi1, xi2 = xi_ref[0, 0, :], xi_ref[0, 1, :], xi_ref[0, 2, :]
    xj0, xj1, xj2 = xj_ref[0, 0, :], xj_ref[0, 1, :], xj_ref[0, 2, :]
    sq = sq_ref[0, 0, :]

    # P = s * R(q) xj + t  (sim3.act convention, q = (x, y, z, w))
    r00 = 1.0 - 2.0 * (qy * qy + qz * qz)
    r01 = 2.0 * (qx * qy - qz * qw)
    r02 = 2.0 * (qx * qz + qy * qw)
    r10 = 2.0 * (qx * qy + qz * qw)
    r11 = 1.0 - 2.0 * (qx * qx + qz * qz)
    r12 = 2.0 * (qy * qz - qx * qw)
    r20 = 2.0 * (qx * qz - qy * qw)
    r21 = 2.0 * (qy * qz + qx * qw)
    r22 = 1.0 - 2.0 * (qx * qx + qy * qy)
    p0 = s * (r00 * xj0 + r01 * xj1 + r02 * xj2) + tx
    p1 = s * (r10 * xj0 + r11 * xj1 + r12 * xj2) + ty
    p2 = s * (r20 * xj0 + r21 * xj1 + r22 * xj2) + tz

    eps = 1e-12
    ni = jnp.sqrt(jnp.maximum(xi0 * xi0 + xi1 * xi1 + xi2 * xi2, eps))
    nj = jnp.sqrt(jnp.maximum(p0 * p0 + p1 * p1 + p2 * p2, eps))
    inv_ni = 1.0 / ni
    inv_nj = 1.0 / nj
    ri0, ri1, ri2 = xi0 * inv_ni, xi1 * inv_ni, xi2 * inv_ni
    rj0, rj1, rj2 = p0 * inv_nj, p1 * inv_nj, p2 * inv_nj

    e0, e1, e2 = rj0 - ri0, rj1 - ri1, rj2 - ri2
    e3 = nj - ni

    # dr_dP = (I - rj rjᵀ) / nj
    d00 = (1.0 - rj0 * rj0) * inv_nj
    d01 = (-rj0 * rj1) * inv_nj
    d02 = (-rj0 * rj2) * inv_nj
    d11 = (1.0 - rj1 * rj1) * inv_nj
    d12 = (-rj1 * rj2) * inv_nj
    d22 = (1.0 - rj2 * rj2) * inv_nj

    zero = jnp.zeros_like(sq)

    # row r components: [J_t(3) | J_rot(3) | J_s | err]  (global_gn.py
    # _ray_residuals layout; neg_skew rows {0,rz,-ry},{-rz,0,rx},{ry,-rx,0})
    rows = (
        (d00, d01, d02, zero, rj2, -rj1, zero, e0),
        (d01, d11, d12, -rj2, zero, rj0, zero, e1),
        (d02, d12, d22, rj1, -rj0, zero, zero, e2),
        (rj0, rj1, rj2, zero, zero, zero, nj, e3),
    )
    sw_ray = sq * (1.0 / sigma_ray)
    sw_dist = sq * (1.0 / sigma_dist)
    sws = (sw_ray, sw_ray, sw_ray, sw_dist)
    errs = (e0, e1, e2, e3)

    # w_r = huber(sw_r * e_r) * sw_r^2
    ws = []
    for sw, e in zip(sws, errs):
        wr = jnp.abs(sw * e)
        hub = jnp.where(wr < huber_k, 1.0, huber_k / jnp.maximum(wr, eps))
        ws.append(hub * sw * sw)

    # B: (8, 4*T) — rows stacked along lanes; Bw = w-scaled copy.
    B = jnp.concatenate(
        [jnp.stack(r, axis=0) for r in rows], axis=1
    )  # (8, 4T)
    wcat = jnp.concatenate(
        [jnp.broadcast_to(w[None, :], (8, w.shape[0])) for w in ws], axis=1
    )
    Bw = B * wcat

    # 8x8 block: VMEM-resident contraction (HIGHEST: default MXU precision
    # truncates f32 operands to bf16)
    partial = jax.lax.dot_general(
        Bw, B, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (8, 8)

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[0, :, 0:8] += partial


@functools.partial(jax.jit, static_argnames=("sigma_ray", "sigma_dist",
                                             "huber_k"))
def edge_hg_rays_pallas(Tij, Xi_t, Xj_t, sq, *, sigma_ray: float,
                        sigma_dist: float, huber_k: float):
    """All edges' local 8x8 blocks in one pallas_call.

    Tij: (E, 8) relative Sim3 per edge; Xi_t, Xj_t: (E, 3, N) channel-major
    points; sq: (E, 1, N) valid*sqrt(q) weights (0 ⇒ pixel contributes
    nothing; padded pixels must carry non-zero dummy points so the row math
    stays finite).  N must be a multiple of TILE_N (pad with sq=0).
    Returns Mloc (E, 8, 8) = Σ w [J|err]ᵀ[J|err] in the LOCAL frame.
    """
    E, _, N = Xi_t.shape
    assert N % TILE_N == 0, (N, TILE_N)
    Tij_pad = jnp.zeros((E, 1, 128), jnp.float32).at[:, 0, :8].set(Tij)
    out = pl.pallas_call(
        functools.partial(_kernel, sigma_ray=sigma_ray,
                          sigma_dist=sigma_dist, huber_k=huber_k),
        out_shape=jax.ShapeDtypeStruct((E, 8, 128), jnp.float32),
        grid=(E, N // TILE_N),
        in_specs=[
            pl.BlockSpec((1, 1, 128), lambda e, t: (e, 0, 0)),
            pl.BlockSpec((1, 3, TILE_N), lambda e, t: (e, 0, t)),
            pl.BlockSpec((1, 3, TILE_N), lambda e, t: (e, 0, t)),
            pl.BlockSpec((1, 1, TILE_N), lambda e, t: (e, 0, t)),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda e, t: (e, 0, 0)),
        # CPU (tests / virtual mesh): Mosaic is TPU-only — interpret
        interpret=jax.default_backend() == "cpu",
    )(Tij_pad, Xi_t, Xj_t, sq)
    return out[:, :, :8]
