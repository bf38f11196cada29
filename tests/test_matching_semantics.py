"""Matcher semantics vs a scalar numpy oracle of the reference CUDA kernels.

The oracles below re-state the exact control flow of
/root/reference/mast3r_slam/backend/src/matching_kernels.cu (per-pixel LM
with lambda up/down and trailing-sample acceptance; dilation-pyramid
descriptor argmax with inside-image skipping) so the vectorised XLA
implementations can be checked step for step on small random problems.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mast3r_slam_tpu.ops import matching


# ---------------------------------------------------------------------------
# oracles (scalar, mirroring the CUDA loops)
# ---------------------------------------------------------------------------

def bilinear(img, u, v):
    """Standard bilinear at float (u, v); img (H, W, C)."""
    u0, v0 = int(np.floor(u)), int(np.floor(v))
    du, dv = u - u0, v - v0
    return (
        (1 - du) * (1 - dv) * img[v0, u0]
        + du * (1 - dv) * img[v0, u0 + 1]
        + (1 - du) * dv * img[v0 + 1, u0]
        + du * dv * img[v0 + 1, u0 + 1]
    )


def iter_proj_oracle(rays_img, target, u, v, max_iter, lam0, cost_thresh):
    """One pixel of iter_proj_kernel (matching_kernels.cu:119-275)."""
    H, W, _ = rays_img.shape
    u = min(max(u, 1.0), W - 2.0)
    v = min(max(v, 1.0), H - 2.0)
    lam = lam0
    conv = False

    def sample(uu, vv):
        s = bilinear(rays_img, uu, vv)
        r = s[0:3] / np.linalg.norm(s[0:3])
        err = r - target
        return err, float(err @ err), s[3:6], s[6:9]

    for _ in range(max_iter):
        err, cost, gx, gy = sample(u, v)
        A00 = gx @ gx + lam
        A01 = gx @ gy
        A11 = gy @ gy + lam
        b0 = -(err @ gx)
        b1 = -(err @ gy)
        det = A00 * A11 - A01 * A01
        det_inv = 0.0 if det == 0 else 1.0 / det
        du = det_inv * (A11 * b0 - A01 * b1)
        dv = det_inv * (-A01 * b0 + A00 * b1)
        un = min(max(u + du, 1.0), W - 2.0)
        vn = min(max(v + dv, 1.0), H - 2.0)
        _, new_cost, _, _ = sample(un, vn)
        if new_cost < cost:
            u, v = un, vn
            lam *= 0.1
            conv = new_cost < cost_thresh
        else:
            lam *= 10.0
            conv = cost < cost_thresh
    return u, v, conv


def refine_oracle(D11, d21, u0, v0, radius, dilation_max):
    """One pixel of refine_matches_kernel (matching_kernels.cu:26-81)."""
    H, W, _ = D11.shape
    for d in range(dilation_max, 0, -1):
        rd = radius * d
        best, bu, bv = -np.inf, u0, v0
        for dy in range(-rd, rd + 1, d):
            for dx in range(-rd, rd + 1, d):
                uu, vv = u0 + dx, v0 + dy
                if 0 <= uu < W and 0 <= vv < H:
                    score = float(D11[vv, uu] @ d21)
                    if score > best:
                        best, bu, bv = score, uu, vv
        u0, v0 = bu, bv
    return u0, v0


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_iter_proj_matches_cuda_semantics(rng):
    H, W = 24, 32
    # smooth ray field with gradients (as prep_for_iter_proj builds it)
    X = rng.normal(size=(1, H, W, 3)).astype(np.float32) * 0.2 + [0, 0, 2.0]
    from scipy.ndimage import gaussian_filter

    X = gaussian_filter(X, sigma=(0, 2, 2, 0))
    rays, _, _ = matching.prep_for_iter_proj(
        jnp.asarray(X), jnp.asarray(X), None
    )
    rays_np = np.asarray(rays[0], dtype=np.float64)

    n = 40
    targets = rays_np[
        rng.integers(1, H - 1, n), rng.integers(1, W - 1, n), 0:3
    ].copy()
    targets /= np.linalg.norm(targets, axis=-1, keepdims=True)
    u_init = rng.uniform(1, W - 2, n)
    v_init = rng.uniform(1, H - 2, n)

    p, conv = matching.iter_proj(
        rays,
        jnp.asarray(targets, dtype=jnp.float32)[None],
        jnp.asarray(np.stack([u_init, v_init], -1), dtype=jnp.float32)[None],
        max_iter=8,
        lambda_init=1e-8,
        cost_thresh=1e-6,
    )
    p = np.asarray(p[0])
    conv = np.asarray(conv[0])

    for i in range(n):
        uo, vo, co = iter_proj_oracle(
            rays_np, targets[i], u_init[i], v_init[i], 8, 1e-8, 1e-6
        )
        # f32 vs f64 trajectories can diverge at decision boundaries; demand
        # agreement to sub-pixel in the common case
        assert abs(p[i, 0] - uo) < 0.5 and abs(p[i, 1] - vo) < 0.5, (
            i, p[i], (uo, vo)
        )


def test_refine_matches_cuda_semantics(rng):
    H, W, F = 20, 28, 8
    D11 = rng.normal(size=(H, W, F)).astype(np.float32)
    D11 /= np.linalg.norm(D11, axis=-1, keepdims=True)
    n = 50
    u0 = rng.integers(0, W, n)
    v0 = rng.integers(0, H, n)
    D21 = rng.normal(size=(n, F)).astype(np.float32)
    D21 /= np.linalg.norm(D21, axis=-1, keepdims=True)

    out = matching.refine_matches(
        jnp.asarray(D11)[None],
        jnp.asarray(D21)[None],
        jnp.asarray(np.stack([u0, v0], -1), dtype=jnp.int32)[None],
        radius=2,
        dilation_max=3,
    )
    out = np.asarray(out[0])

    # int8-quantised oracle (the implementation quantises descriptors)
    D11q = np.clip(np.round(D11 * 127), -127, 127)
    D21q = np.clip(np.round(D21 * 127), -127, 127)
    n_agree = 0
    for i in range(n):
        uo, vo = refine_oracle(D11q, D21q[i], int(u0[i]), int(v0[i]), 2, 3)
        if out[i, 0] == uo and out[i, 1] == vo:
            n_agree += 1
    # ties under quantisation may break differently; demand near-total match
    assert n_agree >= n - 2, (n_agree, n)


def test_refine_gated_full_budget_equals_full_pyramid(rng):
    """With every pixel unconverged and a budget covering N, the gated path
    (strip-table coarse levels + wide-row finest) runs the exact same
    candidate sequence as the reference-exact full pyramid."""
    H, W, F = 16, 24, 8
    N = H * W
    D11 = rng.normal(size=(1, H, W, F)).astype(np.float32)
    D11 /= np.linalg.norm(D11, axis=-1, keepdims=True)
    D21 = rng.normal(size=(1, N, F)).astype(np.float32)
    D21 /= np.linalg.norm(D21, axis=-1, keepdims=True)
    p1 = np.stack(
        [rng.integers(0, W, N), rng.integers(0, H, N)], -1
    ).astype(np.int32)[None]

    full = matching.refine_matches(
        jnp.asarray(D11), jnp.asarray(D21), jnp.asarray(p1),
        radius=2, dilation_max=3,
    )
    gated = matching.refine_matches_gated(
        jnp.asarray(D11), jnp.asarray(D21), jnp.asarray(p1),
        jnp.zeros((1, N), bool),  # all unconverged
        radius=2, dilation_max=3, budget_frac=1.0,
    )
    np.testing.assert_array_equal(np.asarray(gated), np.asarray(full))


def test_pinhole_fit_recovers_intrinsics():
    """fit_pinhole_from_rays is exact on a true pinhole ray image, and
    pinhole_init lands within a pixel of the projection."""
    H, W = 40, 56
    fx, fy, cx, cy = 50.0, 48.0, 27.0, 19.5
    u, v = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    d = np.stack([(u - cx) / fx, (v - cy) / fy, np.ones_like(u)], -1)
    rays = d / np.linalg.norm(d, axis=-1, keepdims=True)
    efx, efy, ecx, ecy = matching.fit_pinhole_from_rays(jnp.asarray(rays)[None])
    assert abs(float(efx[0]) - fx) < 1e-2 and abs(float(efy[0]) - fy) < 1e-2
    assert abs(float(ecx[0]) - cx) < 1e-2 and abs(float(ecy[0]) - cy) < 1e-2

    tgt = rays.reshape(1, -1, 3)
    p = np.asarray(matching.pinhole_init(jnp.asarray(rays)[None], jnp.asarray(tgt)))[0]
    expect = np.stack([u.ravel(), v.ravel()], -1)
    assert np.abs(p - expect).max() < 0.05


def test_iter_proj_gated_matches_exact(rng):
    """proj_gate=converged must agree with the reference-exact path to the
    integer pixel the caller rounds to (freeze-after-convergence bound)."""
    H, W = 24, 32
    X = rng.normal(size=(1, H, W, 3)).astype(np.float32) * 0.2 + [0, 0, 2.0]
    from scipy.ndimage import gaussian_filter

    X = gaussian_filter(X, sigma=(0, 2, 2, 0))
    rays, tgt, p0 = matching.prep_for_iter_proj(jnp.asarray(X), jnp.asarray(X), None)
    # perturb inits by a few pixels
    p0 = p0 + jnp.asarray(rng.uniform(-3, 3, p0.shape), dtype=jnp.float32)

    p_ref, c_ref = matching.iter_proj(rays, tgt, p0, max_iter=10)

    # full budget: every pixel runs all its iterations; the only delta vs
    # reference is freeze-after-convergence, bounded below integer rounding
    p_gate, c_gate = matching.iter_proj(
        rays, tgt, p0, max_iter=10, gate="converged", pre_iters=2,
        budget_frac=1.0,
    )
    pi_ref = np.asarray(jnp.round(p_ref)).astype(int)
    pi_gate = np.asarray(jnp.round(p_gate)).astype(int)
    agree = (pi_ref == pi_gate).all(-1).mean()
    assert agree > 0.98, agree

    # realistic warm start (sub-pixel init error): the default 1/8 budget
    # must hold because almost everything converges in the pre-iterations
    p0w = matching.prep_for_iter_proj(jnp.asarray(X), jnp.asarray(X), None)[2]
    p0w = p0w + jnp.asarray(rng.uniform(-0.5, 0.5, p0w.shape), dtype=jnp.float32)
    p_ref_w, _ = matching.iter_proj(rays, tgt, p0w, max_iter=10)
    p_gate_w, _ = matching.iter_proj(
        rays, tgt, p0w, max_iter=10, gate="converged", pre_iters=2,
        budget_frac=0.125,
    )
    agree_w = (
        np.asarray(jnp.round(p_ref_w)).astype(int)
        == np.asarray(jnp.round(p_gate_w)).astype(int)
    ).all(-1).mean()
    # out-of-budget pixels are converged ones frozen at their flag point; the
    # reference can drift those sub-pixel, occasionally flipping the integer
    # rounding (the downstream +-15px descriptor search absorbs 1px seeds)
    assert agree_w > 0.95, agree_w


def test_refine_gated_speed_knobs_recover_peak(rng):
    """Covering dilation schedule + radius-1 finest (speed.yaml knobs):
    unconverged pixels recover a descriptor peak anywhere in the full
    +-radius*dilation_max window; converged pixels snap +-1."""
    H, W, F = 24, 32, 8
    # smooth unit-norm descriptor field so nearby pixels have similar desc
    from scipy.ndimage import gaussian_filter

    D11 = gaussian_filter(rng.normal(size=(H, W, F)), sigma=(2, 2, 0))
    D11 /= np.linalg.norm(D11, axis=-1, keepdims=True)
    radius, dil = 2, 3  # window +-6

    n = 64
    margin = radius * dil + 1
    tu = rng.integers(margin, W - margin, n)
    tv = rng.integers(margin, H - margin, n)
    D21 = D11[tv, tu]  # exact descriptor at the true position

    # unconverged: init up to the full search offset away
    off = rng.integers(-radius * dil, radius * dil + 1, (n, 2))
    p1 = np.stack([tu, tv], -1) + off
    out = matching.refine_matches_gated(
        jnp.asarray(D11, dtype=jnp.float32)[None],
        jnp.asarray(D21, dtype=jnp.float32)[None],
        jnp.asarray(p1, dtype=jnp.int32)[None],
        jnp.zeros((1, n), bool),
        radius=radius, dilation_max=dil, budget_frac=1.0,
        subset_dilations=(3, 1), final_radius=1,
    )
    out = np.asarray(out[0])
    hit = (out[:, 0] == tu) & (out[:, 1] == tv)
    assert hit.mean() >= 0.9, hit.mean()

    # converged pixels OUTSIDE the compacted subset (the subset is padded
    # with low-index filler pixels) see only the radius-1 final level; it
    # must equal the brute-force int8 argmax over the 3x3 window
    n2 = 256  # > minimum budget of 128 so some pixels stay outside
    tu2 = rng.integers(margin, W - margin, n2)
    tv2 = rng.integers(margin, H - margin, n2)
    D21c = D11[tv2, tu2]
    off1 = rng.integers(-1, 2, (n2, 2))
    p1c = np.stack([tu2, tv2], -1) + off1
    outc = matching.refine_matches_gated(
        jnp.asarray(D11, dtype=jnp.float32)[None],
        jnp.asarray(D21c, dtype=jnp.float32)[None],
        jnp.asarray(p1c, dtype=jnp.int32)[None],
        jnp.ones((1, n2), bool),
        radius=radius, dilation_max=dil, budget_frac=1e-6,  # budget -> 128
        subset_dilations=(3, 1), final_radius=1,
    )
    outc = np.asarray(outc[0])
    D11q = np.clip(np.round(D11 * 127), -127, 127)
    D21q = np.clip(np.round(D21c * 127), -127, 127)
    n_agree = 0
    for i in range(128, n2):  # pixels past the filler subset
        uo, vo = refine_oracle(D11q, D21q[i], int(p1c[i, 0]), int(p1c[i, 1]), 1, 1)
        n_agree += int(outc[i, 0] == uo and outc[i, 1] == vo)
    assert n_agree >= (n2 - 128) - 2, (n_agree, n2 - 128)  # bf16 ties


def test_iter_proj_extra_img_is_exact_tl_lookup(rng):
    """extra_img channels must equal extra[floor(v), floor(u)] at the FINAL
    position, in both the ungated and gated paths (they replace the separate
    occlusion gather of X11[p1], reference matching.py:73)."""
    import jax.numpy as jnp

    H, W = 24, 32
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    z = 2.0 + 0.2 * np.sin(xx / 5.0) * np.cos(yy / 4.0)
    X = np.stack([(xx - W / 2) / 40.0 * z, (yy - H / 2) / 40.0 * z, z], -1)
    X = X[None].astype(np.float32)

    rays, tgt, p0 = matching.prep_for_iter_proj(
        jnp.asarray(X), jnp.asarray(np.roll(X, -3, axis=2)), None
    )
    extra = jnp.asarray(X)
    for gate, pre in (("none", 2), ("converged", 0)):
        p, conv, x_at = matching.iter_proj(
            rays, tgt, p0, max_iter=6, gate=gate, pre_iters=pre,
            budget_frac=0.25, extra_img=extra,
        )
        p = np.asarray(p)
        lin = p[..., 0].astype(np.int64) + W * p[..., 1].astype(np.int64)
        want = X.reshape(1, -1, 3)[0, lin[0]]
        np.testing.assert_array_equal(np.asarray(x_at)[0], want)


def test_cumsum_doubling_matches_jnp(rng):
    """_cumsum_doubling is a hand-rolled primitive (XLA's cumsum lowers to a
    sequential scan on TPU); pin it to jnp.cumsum over awkward shapes."""
    import jax.numpy as jnp

    for n in (1, 2, 3, 127, 128, 1000, 4096):
        x = jnp.asarray(rng.integers(0, 3, (2, n)), jnp.int32)
        got = matching._cumsum_doubling(x)
        want = jnp.cumsum(x, axis=-1)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
