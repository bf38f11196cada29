"""Frame-to-keyframe Sim(3) Gauss-Newton pose solvers.

Device-resident re-design of the reference tracker optimisation
(/root/reference/mast3r_slam/tracker.py:156-266): the ≤50-iteration GN loop
runs entirely inside ``lax.while_loop`` — residual + Jacobian evaluation,
robust IRLS weights, the 7x7 normal equations and the Cholesky solve are all
on-device, no host sync per iteration (the reference's loop is host-driven
python with a device Cholesky per step).

Two residual models:
  * ray + distance (uncalibrated), tracker.py:173-214
  * pixel + log-depth (calibrated), tracker.py:216-266
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import act_sim3, point_to_ray_dist, project_calib, tau_jacobian
from ..lie import sim3
from .robust import huber_weight


class GNSettings(NamedTuple):
    max_iters: int = 50
    rel_error: float = 1e-3
    delta_norm: float = 1e-3
    huber_k: float = 1.345
    sigma_ray: float = 0.003
    sigma_dist: float = 10.0
    sigma_pixel: float = 1.0
    sigma_depth: float = 10.0
    pixel_border: float = -10.0
    depth_eps: float = 1e-6


def _solve_normal_eqs(sqrt_info, r, J, huber_k):
    """Whiten, robust-reweight, assemble H/g, solve 7-dof step.

    sqrt_info, r: (N, R); J: (N, R, 7).  Mirrors tracker.py:156-171.
    H, g and the cost all come out of ONE augmented-Jacobian reduction
    [A | b]ᵀ[A | b] — a single pass over the residual data instead of three.
    Returns (tau (7,), cost, ok).
    """
    whitened = sqrt_info * r
    robust = sqrt_info * jnp.sqrt(huber_weight(whitened, huber_k))
    Ab = robust[..., None] * jnp.concatenate([J, r[..., None]], axis=-1)
    M = jnp.einsum("nri,nrj->ij", Ab, Ab, preferred_element_type=jnp.float32)
    H = M[:7, :7]
    g = -M[:7, 7]
    cost = (0.5 * M[7, 7]).astype(jnp.float32)

    L, lower = jax.scipy.linalg.cho_factor(H, lower=True)
    tau = jax.scipy.linalg.cho_solve((L, lower), g)
    ok = jnp.isfinite(tau).all()
    tau = jnp.where(ok, tau, 0.0)
    return tau, cost, ok


def _gn_loop(residual_fn, T_init, settings: GNSettings):
    """Shared while-loop driver.  residual_fn(T) -> (sqrt_info, r, J)."""

    def cond(state):
        T, old_cost, it, done, ok = state
        return (~done) & ok & (it < settings.max_iters)

    def body(state):
        T, old_cost, it, _, _ = state
        sqrt_info, r, J = residual_fn(T)
        tau, cost, ok = _solve_normal_eqs(sqrt_info, r, J, settings.huber_k)
        T_new = sim3.retr(T, tau)
        # check_convergence (nonlinear_optimizer.py:5-26)
        rel_dec = jnp.abs((old_cost - cost) / jnp.maximum(old_cost, 1e-30))
        delta = jnp.sqrt(jnp.sum(tau * tau))  # VPU reduce, not MXU dot
        converged = (rel_dec < settings.rel_error) | (delta < settings.delta_norm)
        return (T_new, cost, it + 1, converged, ok)

    init = (
        T_init,
        jnp.asarray(jnp.inf, dtype=jnp.float32),
        jnp.asarray(0, dtype=jnp.int32),
        jnp.asarray(False),
        jnp.asarray(True),
    )
    T, cost, it, done, ok = jax.lax.while_loop(cond, body, init)
    return T, cost, ok


@partial(jax.jit, static_argnames=("settings",))
def opt_pose_ray_dist_sim3(Xf, Xk, T_CkCf_init, Qk, valid, settings: GNSettings):
    """Uncalibrated ray+distance pose solve (tracker.py:173-214).

    Xf: (N, 3) matched frame points (already gathered at idx_f2k)
    Xk: (N, 3) keyframe canonical points
    T_CkCf_init: (8,) initial relative pose
    Qk: (N, 1) match confidence, valid: (N, 1) bool
    Returns (T_CkCf (8,), cost, ok).
    """
    w = valid * jnp.sqrt(Qk)
    sqrt_info = jnp.concatenate(
        [jnp.repeat(w / settings.sigma_ray, 3, axis=-1), w / settings.sigma_dist],
        axis=-1,
    )  # (N, 4)
    rd_k = point_to_ray_dist(Xk)

    def residual_fn(T):
        Y = act_sim3(T, Xf)
        rd_f, drd_dX = point_to_ray_dist(Y, jacobian=True)
        r = rd_k - rd_f
        J = -tau_jacobian(drd_dX, Y)
        return sqrt_info, r, J

    return _gn_loop(residual_fn, T_CkCf_init, settings)


@partial(jax.jit, static_argnames=("settings", "img_size"))
def opt_pose_calib_sim3(
    Xf, Xk, T_CkCf_init, Qk, valid, meas_k, valid_meas_k, K, img_size,
    settings: GNSettings,
):
    """Calibrated pixel+log-depth pose solve (tracker.py:216-266).

    meas_k: (N, 3) [u, v, log z] keyframe measurements,
    valid_meas_k: (N, 1) bool (z > depth_eps).
    """
    w = valid * jnp.sqrt(Qk)
    sqrt_info = jnp.concatenate(
        [jnp.repeat(w / settings.sigma_pixel, 2, axis=-1), w / settings.sigma_depth],
        axis=-1,
    )  # (N, 3)

    def residual_fn(T):
        Y = act_sim3(T, Xf)
        pz, dpz_dX, valid_proj = project_calib(
            Y,
            K,
            img_size,
            jacobian=True,
            border=settings.pixel_border,
            z_eps=settings.depth_eps,
        )
        info = (valid_proj & valid_meas_k) * sqrt_info
        r = meas_k - pz
        J = -tau_jacobian(dpz_dX, Y)
        return info, r, J

    return _gn_loop(residual_fn, T_CkCf_init, settings)
