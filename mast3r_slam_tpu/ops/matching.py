"""Dense iterative projective matching — XLA implementation, gather-optimised.

TPU-native re-design of the reference CUDA matchers
(/root/reference/mast3r_slam/backend/src/matching_kernels.cu):

* ``iter_proj`` (matching_kernels.cu:119-275): per-pixel 2-DoF
  Levenberg-Marquardt alignment of a target ray against a normalized ray
  image.  All pixels advance in lock-step; the loop is restructured to ONE
  gather per iteration (the accepted trial sample is carried as the next
  iteration's current sample — numerically identical to the CUDA loop which
  re-samples it), and each sample fetches the full 2x2 bilinear neighbourhood
  as a single row of a pre-packed (H*W, 36) table.

* ``refine_matches`` (matching_kernels.cu:26-81): coarse-to-fine local
  descriptor argmax.  Per dilation level, the whole 7x7 dilated window of
  every pixel is ONE row of a pre-packed (H*W, 49*F) int8 table -> one
  N-row gather + one einsum + argmax per level.

Rationale: measured on TPU v5e, XLA row-gather costs ~8 ns/row nearly
independent of row width (up to ~60 GB/s for KB-wide rows).  Packing whole
windows into rows minimises row count, which is what the op is billed by.
The host-side orchestration (ray-image prep, occlusion gating) mirrors
/root/reference/mast3r_slam/matching.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.image import img_gradient_nhwc
from ..utils.numerics import vnorm, vnormalize


# ---------------------------------------------------------------------------
# iter_proj
# ---------------------------------------------------------------------------

def _pack_bilinear_table(img, extra=None):
    """(B, H, W, C) -> (B, H*W, 4C [+E]) rows [TL, TR, BL, BR [, extra]].

    ``extra`` (B, H, W, E) channels are NOT interpolated: they ride along as
    the value at the row's own pixel, so a sample at float (u, v) returns
    them at exactly (floor(v), floor(u)).  Lets one gather serve both the
    bilinear ray sample and an integer-pixel lookup (e.g. the occlusion
    check's X11[p], reference matching.py:73) — gathers are row-billed on
    TPU, so the wider row is free while a second gather is not.
    """
    B, H, W, C = img.shape
    p = jnp.pad(img, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    tl = p[:, :H, :W]
    tr = p[:, :H, 1 : W + 1]
    bl = p[:, 1 : H + 1, :W]
    br = p[:, 1 : H + 1, 1 : W + 1]
    parts = [tl, tr, bl, br] + ([extra] if extra is not None else [])
    packed = jnp.concatenate(parts, axis=-1)
    return packed.reshape(B, H * W, packed.shape[-1])


def _sample_packed(table, W, u, v, C=None):
    """Bilinear sample from the packed table at float (u, v) (B, N).

    C: channel count of the bilinear part (default: width // 4, no extra).
    Returns (B, N, C), or ((B, N, C), (B, N, E) TL-extra) when the table is
    wider than 4C.
    """
    if C is None:
        C = table.shape[-1] // 4
    u0f = jnp.floor(u)
    v0f = jnp.floor(v)
    du = (u - u0f)[..., None]
    dv = (v - v0f)[..., None]
    idx = v0f.astype(jnp.int32) * W + u0f.astype(jnp.int32)
    rows = jnp.take_along_axis(table, idx[..., None], axis=1)  # (B, N, 4C+E)
    tl = rows[..., 0:C]
    tr = rows[..., C : 2 * C]
    bl = rows[..., 2 * C : 3 * C]
    br = rows[..., 3 * C : 4 * C]
    smp = (
        (1 - du) * (1 - dv) * tl
        + du * (1 - dv) * tr
        + (1 - du) * dv * bl
        + du * dv * br
    )
    if table.shape[-1] > 4 * C:
        return smp, rows[..., 4 * C :]
    return smp


def _ray_err(sample, target):
    r = sample[..., 0:3]
    r = vnormalize(r)  # VPU-exact (utils.numerics)
    err = r - target
    cost = jnp.sum(err * err, axis=-1)
    return err, cost, sample[..., 3:6], sample[..., 6:9]


def fit_pinhole_from_rays(rays, eps: float = 1e-6):
    """Closed-form least-squares pinhole fit to a unit-ray image.

    rays: (B, H, W, 3).  Fits ``u = fx*(rx/rz) + cx`` and
    ``v = fy*(ry/rz) + cy`` over pixels with rz > eps (independent 1-D
    regressions — exact for a pinhole ray image, near-exact after
    undistortion).  Returns (fx, fy, cx, cy), each (B,).
    """
    B, H, W, _ = rays.shape
    dt = rays.dtype
    rz = rays[..., 2]
    valid = (rz > eps).astype(dt)
    safe_z = jnp.where(rz > eps, rz, 1.0)
    x = (rays[..., 0] / safe_z) * valid
    y = (rays[..., 1] / safe_z) * valid
    u = jnp.broadcast_to(jnp.arange(W, dtype=dt)[None, None, :], (B, H, W))
    v = jnp.broadcast_to(jnp.arange(H, dtype=dt)[None, :, None], (B, H, W))
    n = jnp.maximum(jnp.sum(valid, axis=(1, 2)), 1.0)

    def fit(a, b):
        am = (jnp.sum(a, (1, 2)) / n)[:, None, None]
        bm = (jnp.sum(b * valid, (1, 2)) / n)[:, None, None]
        cov = jnp.sum((a - am) * (b - bm) * valid, (1, 2))
        var = jnp.sum((a - am) ** 2 * valid, (1, 2))
        slope = cov / jnp.maximum(var, eps)
        return slope, (bm[:, 0, 0] - slope * am[:, 0, 0])

    fx, cx = fit(x, u)
    fy, cy = fit(y, v)
    return fx, fy, cx, cy


def pinhole_init(rays_img, pts3d_norm):
    """Project target rays through a pinhole fitted to the ray image.

    The canonical ray image is near-pinhole, so this lands within ~a pixel
    of the LM optimum and slashes the iterations needed (ROADMAP item 2).
    rays_img: (B, H, W, >=3); pts3d_norm: (B, N, 3).  Returns (B, N, 2).
    """
    fx, fy, cx, cy = fit_pinhole_from_rays(rays_img[..., :3])
    tz = jnp.maximum(pts3d_norm[..., 2], 1e-6)
    u = fx[:, None] * pts3d_norm[..., 0] / tz + cx[:, None]
    v = fy[:, None] * pts3d_norm[..., 1] / tz + cy[:, None]
    return jnp.stack([u, v], axis=-1)


def _cumsum_doubling(x):
    """Inclusive cumsum over the last axis via log2(N) shift-adds.

    XLA's native cumsum lowers to a sequential scan on TPU (profiled ~0.9 ms
    at N=196608 inside _track_compute); 18 shift-add passes over the same
    array are pure VPU streaming.
    """
    n = x.shape[-1]
    s = 1
    while s < n:
        shifted = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(s, 0)])[..., :n]
        x = x + shifted
        s *= 2
    return x


def _compact_unconverged(conv, budget: int):
    """Indices of ``budget`` pixels per batch row, every unconverged pixel
    first (in index order), converged low-index pixels as filler.

    O(N) cumsum + scatter — measured ~25% cheaper than a stable argsort on
    v5e, and it provably covers ALL unconverged pixels whenever they fit in
    the budget.  Filler slots (and unconverged pixels beyond the budget,
    which are dropped) may duplicate scattered indices; callers iterate
    duplicates identically and scatter back identical values, so duplicates
    are harmless.
    """
    B, N = conv.shape
    unconv = (~conv).astype(jnp.int32)
    rank = _cumsum_doubling(unconv) - 1
    pos = jnp.where(unconv == 1, rank, budget)  # budget == out-of-bounds
    idxs = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    base = jnp.broadcast_to(jnp.arange(budget, dtype=jnp.int32), (B, budget))
    return jax.vmap(lambda b, p, i: b.at[p].set(i, mode="drop"))(base, pos, idxs)


def _sample9x(table, W, u, v):
    """Sample the 9-ch ray table; always returns (sample, TL-extra)."""
    out = _sample_packed(table, W, u, v, C=9)
    if isinstance(out, tuple):
        return out
    return out, out[..., :0]  # zero-width extra: uniform state, XLA elides


def _lm_body(table, W, H, pts3d_norm, cost_thresh):
    """One lock-step LM iteration over (B, N) pixel states.

    Exactly the CUDA loop body (matching_kernels.cu:152-266): solve the
    2x2 LM system, test the trial sample, accept/reject, adapt lambda.
    The accepted trial sample is carried so each iteration costs ONE gather;
    any TL-extra channels (occlusion X11) are carried under the same
    accept/reject, so they always hold the value at the CURRENT (u, v).
    """

    def body(_, state):
        u, v, lam, conv, err, cost, gx, gy, xtl = state

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

        smp, n_xtl = _sample9x(table, W, u_new, v_new)
        n_err, n_cost, n_gx, n_gy = _ray_err(smp, pts3d_norm)

        accept = n_cost < cost
        acc1 = accept[..., None]
        u = jnp.where(accept, u_new, u)
        v = jnp.where(accept, v_new, v)
        lam = jnp.where(accept, lam * 0.1, lam * 10.0)
        conv = jnp.where(accept, n_cost < cost_thresh, cost < cost_thresh)
        err = jnp.where(acc1, n_err, err)
        gx = jnp.where(acc1, n_gx, gx)
        gy = jnp.where(acc1, n_gy, gy)
        cost = jnp.where(accept, n_cost, cost)
        xtl = jnp.where(acc1, n_xtl, xtl)
        return u, v, lam, conv, err, cost, gx, gy, xtl

    return body


@partial(jax.jit, static_argnames=("max_iter", "gate", "pre_iters", "budget_frac"))
def iter_proj(
    rays_with_grad_img,
    pts3d_norm,
    p_init,
    max_iter: int = 10,
    lambda_init: float = 1e-8,
    cost_thresh: float = 1e-6,
    gate: str = "none",
    pre_iters: int = 2,
    budget_frac: float = 0.125,
    p_init_alt=None,
    extra_img=None,
):
    """Vectorised per-pixel LM projective association.

    rays_with_grad_img: (B, H, W, 9)  [unit ray, d/dx, d/dy]
    pts3d_norm:         (B, N, 3)     unit target rays
    p_init:             (B, N, 2)     initial (u, v) guesses
    gate: "none" = all pixels run all max_iter iterations (reference-exact,
    matching_kernels.cu:152 has no early break); "converged" = after
    ``pre_iters`` lock-step iterations, only a compacted subset of
    ``budget_frac * N`` pixels (unconverged-first order) runs the remaining
    iterations.  Pixels inside the budget iterate exactly as the reference;
    pixels left outside are all already-converged (whenever the budget covers
    the unconverged set) and stop where their convergence flag was set — the
    CUDA loop could still drift those by sub-pixel amounts.
    p_init_alt: optional second (B, N, 2) initialisation — the per-pixel
    lower-cost of the two inits seeds the LM (one extra gather).
    extra_img: optional (B, H, W, E) image whose value at the FINAL integer
    pixel floor(v)*W+floor(u) is returned alongside (packed into the same
    gather rows — free on a row-billed gather, where a separate lookup
    gather is not).
    Returns (p_new (B, N, 2) float32, converged (B, N) bool[, extra_at
    (B, N, E)]).
    """
    B, H, W, _ = rays_with_grad_img.shape
    N = pts3d_norm.shape[1]
    rays_with_grad_img = rays_with_grad_img.astype(jnp.float32)
    pts3d_norm = pts3d_norm.astype(jnp.float32)
    p_init = p_init.astype(jnp.float32)
    table = _pack_bilinear_table(rays_with_grad_img, extra_img)  # (B,HW,36+E)

    u = jnp.clip(p_init[..., 0], 1.0, W - 2.0)
    v = jnp.clip(p_init[..., 1], 1.0, H - 2.0)
    lam = jnp.full(u.shape, lambda_init, dtype=u.dtype)

    smp, xtl = _sample9x(table, W, u, v)
    err, cost, gx, gy = _ray_err(smp, pts3d_norm)

    if p_init_alt is not None:
        u2 = jnp.clip(p_init_alt[..., 0].astype(jnp.float32), 1.0, W - 2.0)
        v2 = jnp.clip(p_init_alt[..., 1].astype(jnp.float32), 1.0, H - 2.0)
        smp2, xtl2 = _sample9x(table, W, u2, v2)
        err2, cost2, gx2, gy2 = _ray_err(smp2, pts3d_norm)
        better = cost2 < cost
        b1 = better[..., None]
        u = jnp.where(better, u2, u)
        v = jnp.where(better, v2, v)
        err = jnp.where(b1, err2, err)
        cost = jnp.where(better, cost2, cost)
        gx = jnp.where(b1, gx2, gx)
        gy = jnp.where(b1, gy2, gy)
        xtl = jnp.where(b1, xtl2, xtl)

    # seed the convergence flag from the init cost: the body recomputes conv
    # from the current cost every iteration, so this is semantically inert
    # for gate="none" and only lets gate="converged" compact well-initialised
    # pixels out after fewer lock-step iterations.
    conv = cost < cost_thresh

    state = (u, v, lam, conv, err, cost, gx, gy, xtl)
    body = _lm_body(table, W, H, pts3d_norm, cost_thresh)

    def done(state):
        u, v, conv, xtl = state[0], state[1], state[3], state[8]
        p = jnp.stack([u, v], axis=-1)
        if extra_img is None:
            return p, conv
        return p, conv, xtl

    # loops over the (13*N floats) LM state are UNROLLED: lax.fori_loop
    # materialises the carry every trip (~2.5 ms/iter at 384x512 on v5e,
    # 4x the cost of the iteration itself); max_iter is small and static.
    budget = max(int(N * budget_frac) // 128 * 128, 128)
    if gate == "none" or pre_iters >= max_iter or budget >= N:
        for i in range(max_iter):
            state = body(i, state)
        return done(state)

    # --- gated: lock-step warmup, then compact the stragglers -------------
    for i in range(pre_iters):
        state = body(i, state)
    u, v, lam, conv, err, cost, gx, gy, xtl = state
    sel = _compact_unconverged(conv, budget)

    take = lambda a: jnp.take_along_axis(a, sel, axis=1)
    take3 = lambda a: jnp.take_along_axis(a, sel[..., None], axis=1)
    sub = (
        take(u), take(v), take(lam), take(conv),
        take3(err), take(cost), take3(gx), take3(gy), take3(xtl),
    )
    tgt_sub = take3(pts3d_norm)
    body_sub = _lm_body(table, W, H, tgt_sub, cost_thresh)
    for i in range(max_iter - pre_iters):
        sub = body_sub(i, sub)

    scat = lambda a, val: jax.vmap(lambda x, s, y: x.at[s].set(y))(a, sel, val)
    u = scat(u, sub[0])
    v = scat(v, sub[1])
    conv = scat(conv, sub[3])
    xtl = scat(xtl, sub[8])
    return done((u, v, None, conv, None, None, None, None, xtl))


# ---------------------------------------------------------------------------
# refine_matches
# ---------------------------------------------------------------------------

_SCORE_MIN = jnp.iinfo(jnp.int32).min


def _window_scores(cand_q, d21_q):
    """(B, N, K, F) int8 x (B, N, F) int8 -> (B, N, K) int32 exact scores.

    An integer dot keeps the quantised products exact (deterministic argmax;
    the earlier bf16 product path rounded ~0.2%) and, measured on v5e, XLA
    materialised the bf16 path's (N, K, F) f32 product tensor (~57 MB per
    strip level in the device profile) where the i32 reduce fuses.
    """
    return jax.lax.dot_general(
        cand_q, d21_q,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32,
    )


@partial(jax.jit, static_argnames=("radius", "dilation_max"))
def refine_matches(D11, D21, p1, radius: int = 3, dilation_max: int = 5):
    """Coarse-to-fine descriptor argmax around projected pixels.

    D11: (B, H, W, F) descriptor image of view 1
    D21: (B, N, F)    descriptors of view 2's pixels (predicted in view 1)
    p1:  (B, N, 2)    integer pixel positions to refine
    Returns refined integer positions (B, N, 2) int32.

    Per level the (2r+1)^2 dilated window of every source pixel is packed
    into one (H*W, 49*F) int8 table row (49 static shifted slices of the
    zero-padded image), so each level costs ONE N-row gather + one einsum.
    Outside-image candidates are masked to -inf exactly as the CUDA kernel
    does (matching_kernels.cu:50-58).
    """
    B, H, W, F = D11.shape
    diam = 2 * radius + 1
    ncand = diam * diam

    # int8 quantisation: the reference already drops to fp16 for this search
    # (matching.py:79 D.half()); descriptors are unit-norm so |entry| <= 1 and
    # a 1/127 step adds ~1% score noise — argmax-stable, and it halves the
    # bytes moved by the bandwidth-bound window gathers.
    D11q = jnp.clip(jnp.round(D11 * 127.0), -127, 127).astype(jnp.int8)
    D21q = jnp.clip(jnp.round(D21 * 127.0), -127, 127).astype(jnp.int8)

    u0 = p1[..., 0].astype(jnp.int32)
    v0 = p1[..., 1].astype(jnp.int32)
    doff = jnp.arange(diam, dtype=jnp.int32) - radius  # (-r..r)

    max_rd = radius * dilation_max
    Dpad = jnp.pad(D11q, ((0, 0), (max_rd, max_rd), (max_rd, max_rd), (0, 0)))

    for d in range(dilation_max, 0, -1):
        rd = radius * d
        # window table: rows are the full dilated window per pixel
        wins = [
            Dpad[:, max_rd + dy : max_rd + dy + H, max_rd + dx : max_rd + dx + W]
            for dy in range(-rd, rd + 1, d)
            for dx in range(-rd, rd + 1, d)
        ]
        table = jnp.stack(wins, axis=3).reshape(B, H * W, ncand * F)

        idx = v0 * W + u0
        rows = jnp.take_along_axis(table, idx[..., None], axis=1)
        cand = rows.reshape(B, -1, ncand, F)
        scores = _window_scores(cand, D21q)

        uu = u0[..., None] + doff[None, None, :] * d  # (B, N, diam)
        vv = v0[..., None] + doff[None, None, :] * d
        inside = (
            ((vv >= 0) & (vv < H))[..., :, None]
            & ((uu >= 0) & (uu < W))[..., None, :]
        ).reshape(B, -1, ncand)
        scores = jnp.where(inside, scores, _SCORE_MIN)

        k = jnp.argmax(scores, axis=-1)
        ky = k // diam - radius
        kx = k % diam - radius
        u0 = u0 + kx * d
        v0 = v0 + ky * d

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
    rays = vnormalize(X11)
    gx, gy = img_gradient_nhwc(rays)  # NHWC-native: no layout transposes
    rays_with_grad = jnp.concatenate([rays, gx, gy], axis=-1)  # (B, H, W, 9)

    # the SOURCE side (X21 rows) may be a strided/subset grid smaller than
    # the target image (backend pixel budget) — row count is X21's own
    X21_vec = X21.reshape(B, -1, 3)
    pts3d_norm = vnormalize(X21_vec)

    if idx_1_to_2_init is None:
        assert X21_vec.shape[1] == H * W, (
            "a subset/strided source needs an explicit idx_1_to_2_init "
            "(its pixels' own linear indices in the TARGET grid)"
        )
        idx_1_to_2_init = jnp.broadcast_to(
            jnp.arange(H * W, dtype=jnp.int32), (B, H * W)
        )
    p_init = lin_to_pixel(idx_1_to_2_init, W).astype(X11.dtype)
    return rays_with_grad, pts3d_norm, p_init


def _refine_coarse_subset(Dpad, D21q, u0, v0, H, W, max_rd, radius, dilations):
    """Coarse pyramid levels on a pixel subset via horizontal-strip tables.

    Per level d, a (Hp*W, diam*F) int8 table packs just the HORIZONTAL
    dilated window of the padded image; a pixel's full diam x diam window is
    then ``diam`` rows of it (one per dy), fetched with ONE take_along_axis
    of (B, Nsel*diam) indices.  The table costs diam*F bytes per image pixel
    to build instead of diam^2*F — the full-window table (49F ≈ 230 MB at
    384x512) was the dominant cost of the gated path, built per level just
    to gather ~12% of its rows.
    """
    B, _, _, F = Dpad.shape
    diam = 2 * radius + 1
    ncand = diam * diam
    Hp = H + 2 * max_rd
    doff = jnp.arange(diam, dtype=jnp.int32) - radius

    for d in dilations:
        strips = [
            Dpad[:, :, max_rd + dx * d : max_rd + dx * d + W]
            for dx in range(-radius, radius + 1)
        ]  # each (B, Hp, W, F)
        table = jnp.concatenate(strips, axis=-1).reshape(B, Hp * W, diam * F)

        vp = v0[..., None] + doff[None, None, :] * d + max_rd  # (B, Nsel, diam)
        idx = vp * W + u0[..., None]
        rows = jnp.take_along_axis(table, idx.reshape(B, -1)[..., None], axis=1)
        cand = rows.reshape(B, -1, ncand, F)  # dy-major, matching k decode
        scores = _window_scores(cand, D21q)

        uu = u0[..., None] + doff[None, None, :] * d
        vv = v0[..., None] + doff[None, None, :] * d
        inside = (
            ((vv >= 0) & (vv < H))[..., :, None]
            & ((uu >= 0) & (uu < W))[..., None, :]
        ).reshape(B, -1, ncand)
        scores = jnp.where(inside, scores, _SCORE_MIN)

        k = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # int64 under x64
        u0 = u0 + (k % diam - radius) * d
        v0 = v0 + (k // diam - radius) * d
    return u0, v0


@partial(jax.jit, static_argnames=(
    "radius", "dilation_max", "budget_frac", "subset_dilations", "final_radius"))
def refine_matches_gated(D11, D21, p1, converged, radius: int = 3,
                         dilation_max: int = 5, budget_frac: float = 0.25,
                         subset_dilations=None, final_radius: int = None):
    """Convergence-gated coarse-to-fine refinement (speed mode).

    Ray-converged pixels almost never move more than the finest window under
    descriptor refinement, so the coarse pyramid levels (d = dilation_max..2)
    run only on a compacted subset of UNCONVERGED pixels (budget_frac of N,
    static shape) through cheap strip tables, and a finest level runs on
    every pixel through the wide-row table.  Unconverged pixels beyond the
    budget degrade gracefully to finest-level-only refinement.

    Two further measured-speed knobs (bench: the full-N radius-3 finest
    level costs ~9 ms at 384x512 — pure gather bandwidth — vs ~2.3 ms at
    radius 1; each strip level ~2-3 ms on a 12.5% subset):

    * ``subset_dilations``: the dilation schedule for the subset levels.
      None = reference schedule (dilation_max..2).  A covering schedule like
      (5, 2, 1) spans the same +-radius*dilation_max search region — each
      level's window covers the previous level's quantisation residual
      (radius*d_next >= d_prev/2) — with fewer levels, and its trailing
      d=1 gives the subset a full radius-3 finest pass via strip tables.
    * ``final_radius``: radius of the all-pixels finest level (None = radius,
      the reference window).  With subset_dilations ending in 1, converged
      pixels are the only ones relying on this level, and their projective
      match is already sub-pixel — a radius-1 window captures the
      descriptor snap at ~1/4 the gather bytes.  0 skips the level.
    """
    B, H, W, F = D11.shape
    N = D21.shape[1]  # source ROW count (may be a strided subset grid)
    budget = max(int(N * budget_frac) // 128 * 128, 128)
    budget = min(budget, N)
    if subset_dilations is None:
        subset_dilations = tuple(range(dilation_max, 1, -1))
    if final_radius is None:
        final_radius = radius

    sel = _compact_unconverged(converged, budget)

    p_sel = jnp.take_along_axis(p1.astype(jnp.int32), sel[..., None], axis=1)
    D21_sel = jnp.take_along_axis(D21, sel[..., None], axis=1)

    D11q = jnp.clip(jnp.round(D11 * 127.0), -127, 127).astype(jnp.int8)
    D21q_sel = jnp.clip(jnp.round(D21_sel * 127.0), -127, 127).astype(jnp.int8)
    max_rd = radius * dilation_max
    Dpad = jnp.pad(D11q, ((0, 0), (max_rd, max_rd), (max_rd, max_rd), (0, 0)))
    u0, v0 = _refine_coarse_subset(
        Dpad, D21q_sel, p_sel[..., 0], p_sel[..., 1], H, W, max_rd,
        radius, list(subset_dilations),
    )
    p_all = p1.astype(jnp.int32)
    p_all = jax.vmap(lambda pa, s, pc: pa.at[s].set(pc))(
        p_all, sel, jnp.stack([u0, v0], axis=-1)
    )
    if final_radius == 0:
        return p_all
    return refine_matches(D11, D21, p_all, radius=final_radius, dilation_max=1)


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
    refine_gate: str = "none",
    refine_budget_frac: float = 0.125,
    refine_subset_dilations=None,
    refine_final_radius: int = None,
    proj_gate: str = "none",
    proj_init: str = "warm",
    proj_pre_iters: int = 2,
    proj_budget_frac: float = 0.125,
):
    """Dense 1->2 association (reference matching.py:8-90).

    X11, X21: (B, H, W, 3); D11, D21: (B, H, W, F).
    refine_gate: "none" = reference-exact full pyramid on every pixel;
    "converged" = coarse levels only on unconverged pixels (speed mode),
    tunable via refine_subset_dilations / refine_final_radius (see
    refine_matches_gated).
    proj_gate: "none" = every pixel runs all LM iterations (reference-exact);
    "converged" = straggler compaction after proj_pre_iters (speed mode).
    proj_init: "warm" = previous-frame index (reference); "pinhole" = project
    targets through a pinhole fitted to the ray image; "best" = per-pixel
    lower-cost of the two.
    Returns (idx_1_to_2 (B, N) int32, valid (B, N, 1) bool).
    """
    B, H, W, _ = X11.shape
    rays_with_grad, pts3d_norm, p_init = prep_for_iter_proj(
        X11, X21, idx_1_to_2_init
    )
    p_alt = None
    if proj_init in ("pinhole", "best"):
        p_pin = pinhole_init(rays_with_grad, pts3d_norm)
        if proj_init == "pinhole" or idx_1_to_2_init is None:
            p_init = p_pin
        else:
            p_alt = p_pin
    p1, valid_proj, X11_at = iter_proj(
        rays_with_grad,
        pts3d_norm,
        p_init,
        max_iter=max_iter,
        lambda_init=lambda_init,
        cost_thresh=convergence_thresh,
        gate=proj_gate,
        pre_iters=proj_pre_iters,
        budget_frac=proj_budget_frac,
        p_init_alt=p_alt,
        extra_img=X11,  # X11[p1] rides the LM gathers (occlusion check,
                        # matching.py:73) — saves a full-N row gather
    )
    p1 = p1.astype(jnp.int32)

    # occlusion check: 3D distance between matched points
    dists = vnorm(X11_at - X21.reshape(B, -1, 3), keepdims=False)
    valid = valid_proj & (dists < dist_thresh)

    if radius > 0:
        D21_flat = D21.reshape(B, X21.reshape(B, -1, 3).shape[1], -1)
        if refine_gate == "converged":
            p1 = refine_matches_gated(
                D11, D21_flat, p1, valid_proj, radius=radius,
                dilation_max=dilation_max, budget_frac=refine_budget_frac,
                subset_dilations=refine_subset_dilations,
                final_radius=refine_final_radius,
            )
        else:
            p1 = refine_matches(
                D11, D21_flat, p1, radius=radius, dilation_max=dilation_max
            )

    # pin int32 regardless of x64 mode: the edge store scatters these into
    # int32 SoA buffers and x64-promoted int64 scatters error in future jax
    idx_1_to_2 = pixel_to_lin(p1, W).astype(jnp.int32)
    return idx_1_to_2, valid[..., None]
