"""Tracking GN pose solve cost at production N (while_loop, 50-iter cap)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.lie import sim3
from mast3r_slam_tpu.ops.tracking_gn import (
    GNSettings, opt_pose_ray_dist_sim3,
)

N = 384 * 512


def timeit(fn, *args, n1=3, n2=12, reps=3):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]

    def run(n):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        return time.time() - t0

    run(1)
    t1 = min(run(n1) for _ in range(reps))
    t2 = min(run(n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


key = jax.random.key(0)
Xk = jnp.abs(jax.random.normal(key, (N, 3))) + jnp.asarray([0.0, 0.0, 1.0])
tau_true = jnp.asarray([0.02, -0.01, 0.03, 0.01, -0.02, 0.015, 0.01])
T_true = sim3.retr(sim3.identity(), tau_true)
Xf = sim3.act(sim3.inv(T_true), Xk)
Qk = jnp.ones((N, 1)) * 4.0
valid = jnp.ones((N, 1))

for max_iters in (50, 10):
    s = GNSettings(max_iters=max_iters)
    fn = jax.jit(lambda Xf, Xk, Qk, valid, s=s: opt_pose_ray_dist_sim3(
        Xf, Xk, sim3.identity(), Qk, valid, s))
    T, cost, ok = fn(Xf, Xk, Qk, valid)
    err = float(jnp.linalg.norm(sim3.log(sim3.mul(sim3.inv(T), T_true))))
    print(f"GN ray-dist cap={max_iters}: {timeit(fn, Xf, Xk, Qk, valid)*1e3:8.2f} ms"
          f"  (recovery err {err:.2e}, ok={bool(ok)})", flush=True)

# convergence-free variant: fixed 10 iterations, unrolled outside while_loop
from mast3r_slam_tpu.ops.tracking_gn import _solve_normal_eqs
from mast3r_slam_tpu.geometry import act_sim3, point_to_ray_dist

s = GNSettings()
w = valid * jnp.sqrt(Qk)
sqrt_info = jnp.concatenate(
    [jnp.repeat(w / s.sigma_ray, 3, axis=-1), w / s.sigma_dist], axis=-1)
rd_k = point_to_ray_dist(Xk)


@jax.jit
def gn_unrolled10(Xf, T0):
    T = T0
    for _ in range(10):
        Xf_Ck, dX_dT = act_sim3(T, Xf, jacobian=True)
        rd_f, drd_dX = point_to_ray_dist(Xf_Ck, jacobian=True)
        r = rd_k - rd_f
        J = -jnp.einsum("nij,njk->nik", drd_dX, dX_dT)
        tau, cost, ok = _solve_normal_eqs(sqrt_info, r, J, s.huber_k)
        T = sim3.retr(T, tau)
    return T


print(f"GN 10 iters unrolled:  {timeit(gn_unrolled10, Xf, sim3.identity())*1e3:8.2f} ms", flush=True)
