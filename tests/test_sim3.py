"""Golden tests for the Sim(3) library against numpy closed forms."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from mast3r_slam_tpu.lie import sim3


def random_sim3(rng, n=None):
    shape = () if n is None else (n,)
    q = Rotation.random(n if n is not None else 1, rng).as_quat()  # xyzw
    if n is None:
        q = q[0]
    t = rng.normal(size=shape + (3,))
    s = np.exp(rng.normal(size=shape + (1,)) * 0.3)
    return np.concatenate([t, q, s], axis=-1).astype(np.float32)


def np_matrix(T):
    R = Rotation.from_quat(T[..., 3:7]).as_matrix()
    s = T[..., 7]
    M = np.eye(4)
    M[:3, :3] = s * R
    M[:3, 3] = T[..., :3]
    return M


def test_identity_act(rng):
    X = rng.normal(size=(10, 3)).astype(np.float32)
    Y = sim3.act(sim3.identity(), jnp.asarray(X))
    np.testing.assert_allclose(Y, X, atol=1e-6)


def test_act_matches_matrix(rng):
    T = random_sim3(rng)
    X = rng.normal(size=(50, 3)).astype(np.float32)
    Y = np.asarray(sim3.act(jnp.asarray(T), jnp.asarray(X)))
    M = np_matrix(T)
    Y_ref = (M[:3, :3] @ X.T).T + M[:3, 3]
    np.testing.assert_allclose(Y, Y_ref, atol=1e-4)


def test_mul_matches_matrix(rng):
    Ta, Tb = random_sim3(rng), random_sim3(rng)
    M = np.asarray(sim3.matrix(sim3.mul(jnp.asarray(Ta), jnp.asarray(Tb))))
    M_ref = np_matrix(Ta) @ np_matrix(Tb)
    np.testing.assert_allclose(M, M_ref, atol=1e-4)


def test_inv(rng):
    T = random_sim3(rng, 5)
    M = np.asarray(sim3.matrix(sim3.inv(jnp.asarray(T))))
    for i in range(5):
        np.testing.assert_allclose(M[i], np.linalg.inv(np_matrix(T[i])), atol=1e-4)


def test_rel(rng):
    Ti, Tj = random_sim3(rng), random_sim3(rng)
    Tij = sim3.rel(jnp.asarray(Ti), jnp.asarray(Tj))
    M = np.asarray(sim3.matrix(Tij))
    M_ref = np.linalg.inv(np_matrix(Ti)) @ np_matrix(Tj)
    np.testing.assert_allclose(M, M_ref, atol=1e-4)


@pytest.mark.parametrize("scale_mag", [0.0, 0.5])
@pytest.mark.parametrize("angle_mag", [0.0, 1e-8, 0.3, 2.5])
def test_exp_log_roundtrip(rng, angle_mag, scale_mag):
    xi = rng.normal(size=(8, 7)).astype(np.float64)
    xi[:, 3:6] *= angle_mag / max(np.linalg.norm(xi[:, 3:6], axis=-1).max(), 1e-12)
    xi[:, 6] *= scale_mag
    # f64: proves the math (exp and log are exact inverses)
    T64 = sim3.exp(jnp.asarray(xi, dtype=jnp.float64))
    np.testing.assert_allclose(np.asarray(sim3.log(T64)), xi, atol=1e-10)
    # f32: proves no branch blow-ups at the precision the engine runs at
    T = sim3.exp(jnp.asarray(xi, dtype=jnp.float32))
    xi_back = np.asarray(sim3.log(T))
    np.testing.assert_allclose(xi_back, xi, atol=1e-4)


def test_exp_matches_matrix_expm(rng):
    from scipy.linalg import expm

    xi = (rng.normal(size=(7,)) * 0.5).astype(np.float64)
    # Build the 4x4 Lie algebra element: [sigma I + [phi]x, tau; 0 0]
    tau, phi, sigma = xi[:3], xi[3:6], xi[6]
    A = np.zeros((4, 4))
    A[:3, :3] = sigma * np.eye(3) + np.array(
        [[0, -phi[2], phi[1]], [phi[2], 0, -phi[0]], [-phi[1], phi[0], 0]]
    )
    A[:3, 3] = tau
    M_ref = expm(A)
    M = np.asarray(sim3.matrix(sim3.exp(jnp.asarray(xi, dtype=jnp.float32))))
    np.testing.assert_allclose(M, M_ref, atol=1e-4)


def test_retr_small_step_composition(rng):
    T = random_sim3(rng)
    xi = (rng.normal(size=(7,)) * 1e-3).astype(np.float32)
    T1 = sim3.retr(jnp.asarray(T), jnp.asarray(xi))
    M1 = np.asarray(sim3.matrix(T1))
    M_ref = np_matrix(np.asarray(sim3.exp(jnp.asarray(xi)))) @ np_matrix(T)
    np.testing.assert_allclose(M1, M_ref, atol=1e-5)


def test_apply_adj_inv_consistency(rng):
    """y = Adj-inv row application must satisfy: for any tangent row a acting on
    a camera-frame point residual, y . xi_world == a . xi_local where
    xi_local = Adj_T^-1 xi_world.  We verify numerically via the defining
    identity exp(Adj_T xi) = T exp(xi) T^-1."""
    T = jnp.asarray(random_sim3(rng))
    a = jnp.asarray(rng.normal(size=(7,)).astype(np.float32))
    y = sim3.apply_adj_inv(T, a)

    # Build Adj_T numerically column by column: Adj xi = log(T exp(xi) T^-1)
    eps = 1e-4
    cols = []
    for k in range(7):
        xi = np.zeros(7, dtype=np.float64)
        xi[k] = eps
        Tx = sim3.mul(T, sim3.mul(sim3.exp(jnp.asarray(xi, dtype=jnp.float32)), sim3.inv(T)))
        cols.append(np.asarray(sim3.log(Tx), dtype=np.float64) / eps)
    Adj = np.stack(cols, axis=-1)  # (7, 7)
    # y should equal a^T Adj^-1  (row-vector application of Adj inverse)
    y_ref = np.linalg.solve(Adj.T, np.asarray(a, dtype=np.float64))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-2, atol=2e-3)


def test_to_se3(rng):
    T = random_sim3(rng, 3)
    se3 = np.asarray(sim3.to_se3(jnp.asarray(T)))
    np.testing.assert_allclose(se3, T[..., :7])


def test_log_handles_quaternion_double_cover(rng):
    """log must be stable for qw < 0 (retraction chains can flip the sign)."""
    xi = rng.normal(size=(5, 7)).astype(np.float64) * 0.5
    T = np.asarray(sim3.exp(jnp.asarray(xi)))
    T_neg = T.copy()
    T_neg[:, 3:7] *= -1.0  # same rotation, opposite quaternion sign
    X = rng.normal(size=(5, 20, 3)).astype(np.float64)
    np.testing.assert_allclose(
        np.asarray(sim3.act(jnp.asarray(T_neg)[:, None], jnp.asarray(X))),
        np.asarray(sim3.act(jnp.asarray(T)[:, None], jnp.asarray(X))),
        atol=1e-10,
    )
    back = np.array(sim3.exp(sim3.log(jnp.asarray(T_neg))))
    # exp(log(T)) must reproduce the same TRANSFORM (quat up to sign)
    for i in range(5):
        M1 = np_matrix(T_neg[i])
        M2 = np_matrix(back[i])
        np.testing.assert_allclose(M1, M2, atol=1e-8)


def test_exp_translation_accuracy_in_cancellation_region():
    """f32 exp must stay accurate where the closed-form W-coefficient
    branches catastrophically cancel (small-but-not-tiny sigma/theta).

    r4 regression: at sigma=2.9e-6, theta=8.7e-4 the branch formulas'
    translation was off by ~0.94 against f64 (an 800x blow-up on a real GN
    step — the root cause of the on-chip PCG divergence).  The
    scaling-and-squaring exp must hold ~1e-5 absolute across the whole
    (sigma, theta) grid, including exact zeros and branch boundaries."""
    from scipy.linalg import expm

    rng = np.random.default_rng(0)
    sigmas = [0.0, 1e-8, 1e-7, 2.9e-6, 1e-5, 1e-4, 1e-3, 1e-2, 0.1, 0.5,
              -2.9e-6, -1e-3, -0.1]
    thetas = [0.0, 1e-8, 1e-6, 8.7e-4, 1e-2, 0.3, 2.0, 3.1]
    worst = 0.0
    for sg in sigmas:
        for th in thetas:
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            tau = rng.normal(size=3)
            xi32 = np.concatenate([tau, th * axis, [sg]]).astype(np.float32)
            T = np.asarray(sim3.exp(jnp.asarray(xi32)), np.float64)
            xi = xi32.astype(np.float64)
            P = np.array(
                [[0, -xi[5], xi[4]], [xi[5], 0, -xi[3]],
                 [-xi[4], xi[3], 0]]
            )
            M4 = np.zeros((4, 4))
            M4[:3, :3] = xi[6] * np.eye(3) + P
            M4[:3, 3] = xi[0:3]
            t_ref = expm(M4)[:3, 3]
            err = np.abs(T[0:3] - t_ref).max()
            worst = max(worst, err)
            assert err < 2e-5, (sg, th, err)
    # and the exact regression case from the r4 GN step
    xi = np.zeros(7, np.float32)
    xi[0:3] = [1.15e-3, 0, 0]
    xi[3:6] = [0, 8.716e-4, 0]
    xi[6] = 2.949e-6
    T = np.asarray(sim3.exp(jnp.asarray(xi)), np.float64)
    assert np.abs(T[0] - 1.15e-3) < 1e-6, T[0:3]
