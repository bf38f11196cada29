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
        for eb in (8, 32):
            s = GlobalGNSettings(edge_batch=eb, max_iters=2, solver="dense")
            t0 = time.time()
            T, iters, ok = gauss_newton_poses(*args, s, "rays")
            np.asarray(T[0])
            compile_s = time.time() - t0
            times = []
            for _ in range(3):
                t0 = time.time()
                T, iters, ok = gauss_newton_poses(*args, s, "rays")
                np.asarray(T[0])
                times.append(time.time() - t0)
            print(
                f"solve E={E:4d} N={N} eb={eb:3d}: {min(times)*1e3:8.1f} ms "
                f"({int(iters)} GN iters; compile {compile_s:.1f}s; ok={bool(ok)})",
                flush=True,
            )


def main():
    print("=== solve at production scale ===", flush=True)
    try:
        solve_production_scale()
    except Exception as e:
        print(f"solve-production failed: {e!r}", flush=True)

    print("=== LN statistics A/B (scripts/microbench_ln.py) ===", flush=True)
    sys.argv = ["microbench_ln.py"]
    try:
        runpy.run_path(os.path.join(ROOT, "scripts/microbench_ln.py"),
                       run_name="__main__")
    except Exception as e:
        print(f"LN A/B failed: {e!r}", flush=True)

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
