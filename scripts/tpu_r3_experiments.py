"""One-process driver for the round-3 TPU experiments.

The remote compile service charges each NEW process a queue penalty that has
been observed at 15-35 min (CLAUDE.md hazards), so the LN-statistics A/B
(VERDICT r2 item 7) and the solve-scaling microbench (item 6) run back to
back in one process.
"""

import os
import runpy
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def solve_production_scale():
    """Steady-state global-GN solve timing at PRODUCTION pixel count.

    The r3 system bench showed backend solves costing SECONDS on-chip at
    384x512 (N=196608): suspected cause is the per-iteration edge-Jacobian
    materialisation (Jb is (N, R, 8) per edge, written to HBM and read twice
    by the [J|e]^T W [J|e] einsum ≈ 6 GB of traffic per GN iteration at
    E=128).  Measure steady state vs edge count and edge_batch before
    optimising.
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mast3r_slam_tpu.lie import sim3
    from mast3r_slam_tpu.ops.global_gn import GlobalGNSettings, gauss_newton_poses

    N = 384 * 512
    rng = np.random.default_rng(0)
    P = 16
    gt = np.concatenate(
        [rng.normal(size=(P, 3)) * 0.1,
         np.tile([0, 0, 0, 1.0], (P, 1)),
         np.ones((P, 1))], axis=1
    ).astype(np.float32)
    world = (rng.uniform(-1, 1, size=(N, 3)).astype(np.float32) + [0, 0, 3])
    Xs = np.stack([
        np.asarray(sim3.act(sim3.inv(jnp.asarray(gt[i])), jnp.asarray(world)))
        for i in range(P)
    ])
    Cs = np.full((P, N, 1), 2.0, np.float32)

    for E in (16, 64, 128):
        ii = rng.integers(0, P, size=E).astype(np.int32)
        jj = (ii + 1) % P
        idx = np.tile(np.arange(N, dtype=np.int32), (E, 1))
        valid = np.ones((E, N, 1), bool)
        Q = np.full((E, N, 1), 2.0, np.float32)
        args = (
            jnp.asarray(gt), jnp.asarray(Xs), jnp.asarray(Cs),
            jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(idx),
            jnp.asarray(valid), jnp.asarray(Q),
            jnp.eye(3, dtype=jnp.float32), (1, 1),
        )
        for impl in ("pallas",):
            for eb in (8, 32):
                if impl == "pallas" and eb != 8:
                    continue  # edge_batch is irrelevant to the kernel path
                s = GlobalGNSettings(edge_batch=eb, max_iters=2,
                                     solver="dense", hg_impl=impl)
                t0 = time.time()
                T, iters, ok, _ = gauss_newton_poses(*args, s, "rays")
                np.asarray(T[0])
                compile_s = time.time() - t0
                times = []
                for _ in range(3):
                    t0 = time.time()
                    T, iters, ok, _ = gauss_newton_poses(*args, s, "rays")
                    np.asarray(T[0])
                    times.append(time.time() - t0)
                print(
                    f"solve E={E:4d} N={N} {impl:6s} eb={eb:3d}: "
                    f"{min(times)*1e3:8.1f} ms ({int(iters)} GN iters; "
                    f"compile {compile_s:.1f}s; ok={bool(ok)})",
                    flush=True,
                )


def pcg_diag():
    """On-chip PCG divergence hunt: M=256 chain problem, one GN linear
    solve, TRUE residual computed on the host in f64, block vs diag
    preconditioner.  CPU converges (rel_res ~1e-4); if TPU only fails with
    precond=block, the batched 7x7 cho_factor/cho_solve is the culprit."""
    import time
    from functools import partial as _partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mast3r_slam_tpu.lie import sim3
    from mast3r_slam_tpu.ops import global_gn as G

    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from microbench_solve_scale import build_problem

    p = build_problem(256)
    gt, noisy, Xs, Cs, ii, jj, idx, valid, Q = p
    s = G.GlobalGNSettings(edge_batch=64, max_iters=1)
    ii_j, jj_j = jnp.asarray(ii), jnp.asarray(jj)
    Xi, Xj, sq, ut, vt = G.precompute_edge_data(
        jnp.asarray(Xs), jnp.asarray(Cs), ii_j, jj_j, jnp.asarray(idx),
        jnp.asarray(valid), jnp.asarray(Q), s, "rays", (1, 1),
    )
    Twc = jnp.asarray(noisy)
    H_e, g_e = jax.lax.map(
        _partial(lambda T, e: G._edge_block_rays(T, s, e), Twc),
        (ii_j, jj_j, Xi, Xj, sq, ut, vt), batch_size=64,
    )
    He = np.asarray(H_e, np.float64)
    ge = np.asarray(g_e, np.float64)
    print(f"H_e checksum: {np.abs(He).sum():.6e}  g_e: {np.abs(ge).sum():.6e}"
          f"  (CPU ref: compare manually)", flush=True)

    M = 256
    Mfree = M - 1
    io = np.where(ii - 1 >= 0, ii - 1, Mfree)
    jo = np.where(jj - 1 >= 0, jj - 1, Mfree)

    def true_residual(dx, damping):
        b = np.zeros((Mfree + 1, 7))
        np.add.at(b, io, ge)
        np.add.at(b, jo, -ge)
        b = b[:Mfree]
        D = np.zeros((Mfree + 1, 7, 7))
        np.add.at(D, io, He)
        np.add.at(D, jo, He)
        D = D[:Mfree]
        tr = np.trace(D, axis1=-2, axis2=-1)[:, None, None] / 7.0
        D = D + (damping + 1e-6) * np.maximum(tr, 1e-12) * np.eye(7)
        x = np.asarray(dx, np.float64)
        xp = np.concatenate([x, np.zeros((1, 7))])
        y = np.einsum("mij,mj->mi", D, x)
        acc = np.zeros((Mfree + 1, 7))
        np.add.at(acc, io, -np.einsum("eij,ej->ei", He, xp[jo]))
        np.add.at(acc, jo, -np.einsum("eij,ej->ei", He, xp[io]))
        Ax = y + acc[:Mfree]
        return np.linalg.norm(Ax - b) / max(np.linalg.norm(b), 1e-30)

    for precond in ("block", "diag"):
        for iters in (96, 256):
            dx, ok = G._assemble_and_solve_pcg(
                H_e, g_e, ii_j, jj_j, M, 1, iters, 1e-7, 1e-4, precond
            )
            res = true_residual(dx, 1e-4)
            print(f"pcg_diag M=256 precond={precond:5s} iters={iters}: "
                  f"|dx|={float(jnp.linalg.norm(dx)):.4g} "
                  f"rel_res={res:.3e} ok={bool(ok)}", flush=True)


def pcg_loop_diag():
    """Which GN iteration diverges, and does the preconditioner matter?
    Full gauss_newton_poses at M=256 with max_iters swept and both
    preconditioners; errors printed per configuration."""
    import jax.numpy as jnp
    import numpy as np

    from mast3r_slam_tpu.ops.global_gn import GlobalGNSettings, gauss_newton_poses

    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from microbench_solve_scale import build_problem

    gt, noisy, Xs, Cs, ii, jj, idx, valid, Q = build_problem(256)
    args = (
        jnp.asarray(noisy), jnp.asarray(Xs), jnp.asarray(Cs),
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(idx),
        jnp.asarray(valid), jnp.asarray(Q),
        jnp.eye(3, dtype=jnp.float32), (1, 1),
    )
    init = np.linalg.norm(noisy[:, :3] - gt[:, :3], axis=-1).mean()
    print(f"pcg_loop_diag init err {init:.5f}", flush=True)
    for precond in ("block", "diag"):
        errs = []
        for mi in (1, 2, 3, 4):
            s = GlobalGNSettings(edge_batch=64, solver="pcg", max_iters=mi,
                                 pcg_precond=precond)
            T, it, ok, _ = gauss_newton_poses(*args, s, "rays")
            err = np.linalg.norm(
                np.asarray(T)[:, :3] - gt[:, :3], axis=-1
            ).mean()
            errs.append(f"it{mi}={err:.5f}/ok={bool(ok)}")
        print(f"pcg_loop_diag precond={precond}: " + "  ".join(errs),
              flush=True)


def profile_solve():
    """Device-profile one production-scale solve (E=64, N=196608): the r4
    A/B showed pallas ≈ reduce ≈ dot (~5 ms/edge for a 2-iter solve), so
    the cost is NOT the per-iteration edge blocks — find what it is."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mast3r_slam_tpu.lie import sim3
    from mast3r_slam_tpu.ops.global_gn import GlobalGNSettings, gauss_newton_poses

    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from profile_stages import trace_and_report

    N = 384 * 512
    P, E = 16, 64
    rng = np.random.default_rng(0)
    gt = np.concatenate(
        [rng.normal(size=(P, 3)).astype(np.float32) * 0.1,
         np.tile(np.float32([0, 0, 0, 1]), (P, 1)),
         np.ones((P, 1), np.float32)], axis=1
    )
    world = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32) + np.float32(
        [0, 0, 3]
    )
    Xs = np.stack([
        np.asarray(sim3.act(sim3.inv(jnp.asarray(gt[i])), jnp.asarray(world)))
        for i in range(P)
    ])
    Cs = np.full((P, N, 1), 2.0, np.float32)
    ii = (rng.integers(0, P, size=E)).astype(np.int32)
    jj = (ii + 1) % P
    idx = np.tile(np.arange(N, dtype=np.int32), (E, 1))
    valid = np.ones((E, N, 1), bool)
    Q = np.full((E, N, 1), 2.0, np.float32)
    jargs = (
        jnp.asarray(gt), jnp.asarray(Xs), jnp.asarray(Cs),
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(idx),
        jnp.asarray(valid), jnp.asarray(Q),
        jnp.eye(3, dtype=jnp.float32), (1, 1),
    )
    for impl in ("reduce", "pallas"):
        s = GlobalGNSettings(edge_batch=8, max_iters=2, solver="dense",
                             hg_impl=impl)
        trace_and_report(
            f"solve_{impl}",
            lambda a=jargs, st=s: gauss_newton_poses(*a, st, "rays")[0],
            reps=2, top=20,
        )


def main():
    # select sections by name on argv, e.g.:
    #   python scripts/tpu_r3_experiments.py loop_diag scale
    # no args = everything
    want = set(sys.argv[1:]) or {
        "profile", "loop_diag", "diag", "production", "scale"
    }

    if "profile" in want:
        print("=== solve device profile ===", flush=True)
        try:
            profile_solve()
        except Exception as e:
            print(f"profile_solve failed: {e!r}", flush=True)

    if "loop_diag" in want:
        print("=== pcg loop divergence sweep ===", flush=True)
        try:
            pcg_loop_diag()
        except Exception as e:
            print(f"pcg_loop_diag failed: {e!r}", flush=True)

    if "diag" in want:
        print("=== pcg divergence diagnostic ===", flush=True)
        try:
            pcg_diag()
        except Exception as e:
            print(f"pcg_diag failed: {e!r}", flush=True)

    if "production" in want:
        print("=== solve at production scale ===", flush=True)
        try:
            solve_production_scale()
        except Exception as e:
            print(f"solve-production failed: {e!r}", flush=True)

    if "scale" in want:
        print("\n=== solve scaling (scripts/microbench_solve_scale.py) ===",
              flush=True)
        sys.argv = ["microbench_solve_scale.py", "--sizes", "256,512,1024",
                    "--iters", "4"]
        try:
            runpy.run_path(os.path.join(ROOT, "scripts/microbench_solve_scale.py"),
                           run_name="__main__")
        except Exception as e:
            print(f"solve-scale failed: {e!r}", flush=True)


if __name__ == "__main__":
    main()
