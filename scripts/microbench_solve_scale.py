"""Global-GN solve scaling: dense Cholesky vs block-sparse PCG at M poses.

VERDICT r2 item 6: probe solve time + peak scatter memory at M = 256 / 512 /
1024 / 2048.  The dense path's (M+1, M+1, 7, 7) scatter is O(M^2) memory
(206 MB at M=1024, 824 MB at M=2048) with an O((7M)^3) factor; the PCG path
is O(E + M).  Policy recorded in BASELINE.md; `local_opt.solver: auto`
switches at `dense_max_poses`.

Run on TPU (ambient env) or CPU (--platform cpu).  ONE process, interleaved.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_problem(M, N=64, seed=0):
    from mast3r_slam_tpu.lie import sim3

    rng = np.random.default_rng(seed)
    # smooth arc trajectory + chain edges + loop edges every 64
    s = np.linspace(0, 1, M)
    t = np.stack([2.0 * np.sin(s * 6), 0.2 * s, 0.3 * s], -1)
    yaw = -1.2 * s
    q = np.stack([np.zeros(M), np.sin(yaw / 2), np.zeros(M), np.cos(yaw / 2)], -1)
    gt = np.concatenate([t, q, np.ones((M, 1))], -1).astype(np.float32)

    world = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32) + [0, 0, 3]
    Xs = np.stack([
        np.asarray(sim3.act(sim3.inv(jnp.asarray(gt[i])), jnp.asarray(world)))
        for i in range(M)
    ])
    Cs = np.full((M, N, 1), 2.0, np.float32)
    e1 = [(i, i + 1) for i in range(M - 1)]
    loops = [(i, i + 64) for i in range(0, M - 64, 64)]
    pairs = e1 + [(b, a) for a, b in e1] + loops + [(b, a) for a, b in loops]
    ii = np.asarray([a for a, _ in pairs], np.int32)
    jj = np.asarray([b for _, b in pairs], np.int32)
    E = len(ii)
    idx = np.tile(np.arange(N, dtype=np.int32), (E, 1))
    valid = np.ones((E, N, 1), bool)
    Q = np.full((E, N, 1), 2.0, np.float32)
    tau = rng.normal(size=(M, 7)).astype(np.float32) * 0.01
    tau[0] = 0
    noisy = np.asarray(sim3.retr(jnp.asarray(gt), jnp.asarray(tau)))
    return gt, noisy, Xs, Cs, ii, jj, idx, valid, Q


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="")
    ap.add_argument("--sizes", default="256,512,1024,2048")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from mast3r_slam_tpu.ops.global_gn import GlobalGNSettings, gauss_newton_poses

    print(f"devices: {jax.devices()}", flush=True)
    for M in map(int, args.sizes.split(",")):
        gt, noisy, Xs, Cs, ii, jj, idx, valid, Q = build_problem(M)
        jargs = (
            jnp.asarray(noisy), jnp.asarray(Xs), jnp.asarray(Cs),
            jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(idx),
            jnp.asarray(valid), jnp.asarray(Q),
            jnp.eye(3, dtype=jnp.float32), (1, 1),
        )
        for solver in ("dense", "pcg"):
            if solver == "dense" and M > 1024:
                print(f"M={M:5d} dense: SKIPPED (scatter alone "
                      f"{(M + 1) ** 2 * 49 * 4 / 1e9:.2f} GB/iter)", flush=True)
                continue
            s = GlobalGNSettings(edge_batch=64, solver=solver,
                                 max_iters=args.iters)
            try:
                t0 = time.time()
                T, iters, ok, _ = gauss_newton_poses(*jargs, s, "rays")
                np.asarray(T[0])
                compile_s = time.time() - t0
                t0 = time.time()
                T, iters, ok, _ = gauss_newton_poses(*jargs, s, "rays")
                np.asarray(T[0])
                run_s = time.time() - t0
                err = np.linalg.norm(np.asarray(T)[:, :3] - gt[:, :3], axis=-1)
                init = np.linalg.norm(noisy[:, :3] - gt[:, :3], axis=-1)
                print(
                    f"M={M:5d} {solver:5s}: {run_s * 1e3:8.1f} ms "
                    f"({int(iters)} GN iters, compile {compile_s:.1f}s)  "
                    f"ok={bool(ok)}  err {init.mean():.4f}->{err.mean():.4f}",
                    flush=True,
                )
            except Exception as e:
                print(f"M={M:5d} {solver:5s}: FAILED {e!r}", flush=True)


if __name__ == "__main__":
    main()
