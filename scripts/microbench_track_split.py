"""Split _track_compute's cost: match / GN / fusion+gating+stats pieces."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.ops import matching
from mast3r_slam_tpu.slam.tracker import TrackerSettings, _track_compute
from mast3r_slam_tpu.slam.frame import fuse_pointmap
from mast3r_slam_tpu.config import load_config
from mast3r_slam_tpu.lie import sim3


def timeit(fn, *args, n1=3, n2=9, reps=3):
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


H, W = 384, 512
N = H * W
key = jax.random.key(1)
uu, vv = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                      jnp.arange(H, dtype=jnp.float32))
z = 2.0 + 0.4 * jnp.sin(uu / 37.0) * jnp.cos(vv / 29.0)
X = jnp.stack([(uu - W / 2) / 500.0 * z, (vv - H / 2) / 500.0 * z, z], -1)[None]
X2 = X + jnp.array([0.03, 0.01, 0.02])
D = jax.random.normal(key, (1, H, W, 24), jnp.float32)
D = D / jnp.linalg.norm(D, axis=-1, keepdims=True)
C = jnp.ones((1, H, W)) * 3.0
idx0 = jnp.arange(N, dtype=jnp.int32)
kf_X = X.reshape(N, 3)
kf_C = jnp.ones((N, 1)) * 2.0
T_id = sim3.identity()
K = jnp.eye(3, dtype=jnp.float32)

ts = TrackerSettings.from_config(load_config("speed"))

mk = dict(proj_gate="converged", refine_gate="converged", proj_init="best",
          proj_pre_iters=0, proj_budget_frac=0.0625,
          refine_budget_frac=0.0625, refine_final_radius=1,
          refine_subset_dilations=(5, 2, 1))

m = jax.jit(lambda a, b, c, d, e: matching.match(a, b, c, d, e, **mk))
print(f"match only:        {timeit(m, X, X2, D, D, idx0[None])*1e3:7.2f} ms", flush=True)

idx_f2k, valid = m(X, X2, D, D, idx0[None])
idx_f2k, valid = jax.block_until_ready((idx_f2k[0], valid[0]))


@jax.jit
def rest(idx_f2k, valid_match, Xii, Cii, Qii, Xji, Cji, Qji, kf_X, kf_C, T_WCf, T_WCk):
    """Everything in _track_compute after match (steps 2-6)."""
    Xii_f = Xii.reshape(N, 3)
    Cii_f = Cii.reshape(N, 1)
    Qii_f = Qii.reshape(N, 1)
    Xji_f = Xji.reshape(N, 3)
    Cji_f = Cji.reshape(N, 1)

    fX, fC, fn, _, _ = fuse_pointmap(Xii_f, Cii_f, 1, 1,
                                     Xii_f, Cii_f, mode=ts.filtering_mode)
    Cf_avg = fC / fn.astype(fC.dtype)
    Ck_avg = kf_C / 1.0
    gathered = jnp.concatenate([fX, Cf_avg, Qii_f], axis=-1)[idx_f2k]
    Xf = gathered[:, 0:3]
    Cf = gathered[:, 3:4]
    Qk = jnp.sqrt(gathered[:, 4:5] * Qji.reshape(N, 1))
    valid_opt = valid_match & (Cf > ts.C_conf) & (Ck_avg > ts.C_conf) & (Qk > ts.Q_conf)
    match_frac = jnp.mean(valid_opt.astype(jnp.float32))

    from mast3r_slam_tpu.ops.tracking_gn import opt_pose_ray_dist_sim3
    T_CkCf, cost, ok = opt_pose_ray_dist_sim3(
        Xf, kf_X, sim3.rel(T_WCk, T_WCf), Qk, valid_opt.astype(Xf.dtype), ts.gn)

    Xkk = sim3.act(T_CkCf, Xji_f)
    kX, kC, kn, _, _ = fuse_pointmap(kf_X, kf_C, 1, 1,
                                     Xkk, Cji_f, mode=ts.filtering_mode)
    hit = jnp.zeros((N,), dtype=jnp.float32).at[idx_f2k].max(
        valid_match[:, 0].astype(jnp.float32))
    return sim3.mul(T_WCk, T_CkCf), match_frac, kX, kC, jnp.sum(hit)


args = (idx_f2k, valid, X, C, C, X2, C, C, kf_X, kf_C, T_id, T_id)
print(f"rest (GN+fuse+stats):{timeit(rest, *args)*1e3:7.2f} ms", flush=True)


@jax.jit
def stats_only(idx_f2k, valid_match):
    hit = jnp.zeros((N,), dtype=jnp.float32).at[idx_f2k].max(
        valid_match[:, 0].astype(jnp.float32))
    return jnp.sum(hit)

print(f"unique-scatter only: {timeit(stats_only, idx_f2k, valid)*1e3:7.2f} ms", flush=True)


@jax.jit
def gather_only(idx_f2k, Xii, Cii, Qii):
    g = jnp.concatenate([Xii.reshape(N, 3), Cii.reshape(N, 1),
                         Qii.reshape(N, 1)], axis=-1)[idx_f2k]
    return jnp.sum(g)

print(f"track-gather only:  {timeit(gather_only, idx_f2k, X, C, C)*1e3:7.2f} ms", flush=True)

fn = lambda *a: _track_compute(*a)["T_WCf"]
targs = (ts, (H, W), X, C, D, C, X2, C, D, C,
         X.reshape(N, 3), C.reshape(N, 1), jnp.asarray(1, jnp.int32),
         jnp.asarray(1, jnp.int32), jnp.asarray(-jnp.inf, jnp.float32),
         kf_X, kf_C, jnp.asarray(1, jnp.int32),
         jnp.asarray(1, jnp.int32), jnp.asarray(-jnp.inf, jnp.float32), T_id, T_id, idx0, K)
print(f"track_compute speed:{timeit(fn, *targs)*1e3:7.2f} ms", flush=True)
