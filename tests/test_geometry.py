"""Geometry Jacobians vs finite differences (SURVEY.md §7 M0 golden tests)."""

import numpy as np
import jax.numpy as jnp

from mast3r_slam_tpu.geometry import (
    act_sim3,
    backproject,
    constrain_points_to_ray,
    get_pixel_coords,
    point_to_ray_dist,
    project_calib,
)
from mast3r_slam_tpu.lie import sim3


def finite_diff(f, x, eps=1e-4):
    x = np.asarray(x, dtype=np.float64)
    y0 = np.asarray(f(x), dtype=np.float64)
    J = np.zeros(y0.shape + x.shape)
    for idx in np.ndindex(*x.shape):
        xp = x.copy()
        xp[idx] += eps
        xm = x.copy()
        xm[idx] -= eps
        J[(Ellipsis,) + idx] = (np.asarray(f(xp), dtype=np.float64) - np.asarray(f(xm), dtype=np.float64)) / (2 * eps)
    return y0, J


def test_point_to_ray_dist_jacobian(rng):
    X = rng.normal(size=(3,)) + np.array([0, 0, 3.0])
    rd, J = point_to_ray_dist(jnp.asarray(X, dtype=jnp.float32), jacobian=True)
    _, J_fd = finite_diff(lambda x: point_to_ray_dist(jnp.asarray(x, dtype=jnp.float64)), X)
    np.testing.assert_allclose(np.asarray(J), J_fd, atol=1e-3)


def test_act_sim3_jacobian(rng):
    """d(exp(eps) T X)/d(eps) at eps=0 must equal [I, -skew(TX), TX]."""
    T = jnp.asarray(
        np.concatenate(
            [rng.normal(size=3), [0, 0, 0, 1], [1.3]]
        ).astype(np.float32)
    )
    X = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32) + np.array([0, 0, 4.0], dtype=np.float32))
    Y, J = act_sim3(T, X, jacobian=True)

    def f(eps):
        Te = sim3.mul(sim3.exp(jnp.asarray(eps, dtype=jnp.float64)), T.astype(jnp.float64))
        return sim3.act(Te, X.astype(jnp.float64))

    _, J_fd = finite_diff(f, np.zeros(7))
    np.testing.assert_allclose(np.asarray(J), J_fd, atol=1e-3, rtol=1e-3)


def test_tau_jacobian_matches_dense_chain(rng):
    """tau_jacobian's structured expansion == dres_dY @ [I | -skew(Y) | Y]."""
    from mast3r_slam_tpu.geometry import tau_jacobian

    Y = jnp.asarray(rng.normal(size=(6, 3)).astype(np.float32) + np.array([0, 0, 3.0], dtype=np.float32))
    dres = jnp.asarray(rng.normal(size=(6, 4, 3)).astype(np.float32))
    _, dY_dtau = act_sim3(sim3.identity(), Y, jacobian=True)
    J_dense = jnp.einsum("nij,njk->nik", dres, dY_dtau)
    J_fast = tau_jacobian(dres, Y)
    np.testing.assert_allclose(np.asarray(J_fast), np.asarray(J_dense), atol=1e-5, rtol=1e-5)


def test_project_calib_jacobian(rng):
    K = jnp.asarray([[400.0, 0, 320], [0, 400, 240], [0, 0, 1]], dtype=jnp.float32)
    P = rng.normal(size=(7, 3)) * 0.5 + np.array([0, 0, 2.0])
    pz, J, valid = project_calib(
        jnp.asarray(P, dtype=jnp.float32), K, (480, 640), jacobian=True
    )

    def f(p):
        out, _ = project_calib(jnp.asarray(p, dtype=jnp.float64), K.astype(jnp.float64), (480, 640))
        return out

    for i in range(7):
        _, J_fd = finite_diff(f, P[i])
        np.testing.assert_allclose(np.asarray(J[i]), J_fd, atol=1e-3, rtol=1e-3)


def test_project_backproject_roundtrip(rng):
    K = jnp.asarray([[400.0, 0, 320], [0, 400, 240], [0, 0, 1]], dtype=jnp.float32)
    P = jnp.asarray((rng.normal(size=(20, 3)) * 0.3 + [0, 0, 2.5]).astype(np.float32))
    pz, valid = project_calib(P, K, (480, 640))
    P2 = backproject(pz[..., :2], jnp.exp(pz[..., 2:3]), K)
    np.testing.assert_allclose(np.asarray(P2), np.asarray(P), atol=1e-3)


def test_constrain_points_to_ray_preserves_depth(rng):
    K = jnp.asarray([[100.0, 0, 32], [0, 100, 24], [0, 0, 1]], dtype=jnp.float32)
    H, W = 48, 64
    X = jnp.asarray((rng.normal(size=(H * W, 3)) * 0.1 + [0, 0, 2.0]).astype(np.float32))
    Xc = constrain_points_to_ray((H, W), X, K)
    np.testing.assert_allclose(np.asarray(Xc[..., 2]), np.asarray(X[..., 2]), atol=1e-6)
    # constrained points project exactly onto the pixel grid
    pz, _ = project_calib(Xc, K, (H, W))
    uv = np.asarray(get_pixel_coords((H, W)).reshape(-1, 2))
    np.testing.assert_allclose(np.asarray(pz[..., :2]), uv, atol=1e-2)


def test_pixel_coords_layout():
    uv = np.asarray(get_pixel_coords((2, 3)))
    assert uv.shape == (2, 3, 2)
    np.testing.assert_allclose(uv[0, :, 0], [0, 1, 2])  # u along width
    np.testing.assert_allclose(uv[:, 0, 1], [0, 1])  # v along height
