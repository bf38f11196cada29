"""Round-4 TPU experiment driver (section-selectable, one process).

Usage: python scripts/tpu_r4_experiments.py <section> [<section>...]

Sections:
  gatherprobe  Mosaic in-VMEM gather: does `jnp.take` from a VMEM-resident
               table compile, and at what rows/s vs the XLA HBM gather?
               This decides the Pallas-matcher design (VERDICT r3 item 3):
               the whole int8 descriptor image (4.7 MB) and the f32 ray
               image (7.1 MB) both FIT in VMEM, so if in-VMEM gather beats
               ~8 ns/row the matcher's gather wall moves.
  pcg          On-chip PCG GN-loop convergence at M=256/512/1024 (the r3
               divergence was root-caused to jnp.vdot MXU truncation and
               fixed; this validates the fix on hardware — VERDICT weak 1).
  cache        Solve-path A/B at production scale: gathered-point cache
               (steady-state refresh) vs full in-solve gather.
  ivf          Bucketed IVF search scaling (microbench_ivf).

All timings use robust_diff_time (fenced batches, median differential).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _fence(x):
    np.asarray(x).ravel()[:1]


def _timeit(fn, n1=5, n2=15, reps=3, warm=2):
    from mast3r_slam_tpu.utils.timing import robust_diff_time

    def batch(n):
        t0 = time.time()
        for _ in range(n):
            o = fn()
        _fence(o)
        return time.time() - t0

    batch(warm)
    return robust_diff_time(batch, n1=n1, n2=n2, reps=reps)


# ---------------------------------------------------------------------------
# gatherprobe
# ---------------------------------------------------------------------------

def gatherprobe():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    def make_kernel(M, F, Tn, dtype):
        def kern(table_ref, idx_ref, out_ref):
            idx = idx_ref[:]  # (Tn, 128) int32
            vals = jnp.take(table_ref[:], idx.reshape(-1), axis=0)
            out_ref[:] = jnp.sum(
                vals.astype(jnp.float32), axis=-1
            ).reshape(Tn, 128)

        @jax.jit
        def run(table, idx):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((Tn, 128), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(table, idx)

        return run

    for dtype, dname in ((jnp.int8, "int8"), (jnp.float32, "f32")):
        for M in (4096, 32768, 196608):
            for F in (16, 32):
                for Tn in (128, 1536):  # 16k / 196k lookups
                    nrows = Tn * 128
                    try:
                        table = jnp.asarray(
                            rng.integers(-100, 100, size=(M, F)), dtype
                        )
                        idx = jnp.asarray(
                            rng.integers(0, M, size=(Tn, 128)), jnp.int32
                        )
                        run = make_kernel(M, F, Tn, dtype)
                        _fence(run(table, idx))  # compile
                        dt, ub = _timeit(lambda: run(table, idx))
                        flag = " UB" if ub else ""
                        print(
                            f"pallas vmem-take {dname} M={M:6d} F={F} "
                            f"rows={nrows:6d}: {dt*1e3:7.3f} ms "
                            f"({dt/nrows*1e9:6.2f} ns/row){flag}",
                            flush=True,
                        )
                    except Exception as e:
                        msg = str(e).replace("\n", " ")[:160]
                        print(
                            f"pallas vmem-take {dname} M={M} F={F} "
                            f"rows={nrows}: FAILED {msg}",
                            flush=True,
                        )

    # XLA HBM-gather baseline at the same shapes
    import jax

    for dtype, dname in ((jnp.int8, "int8"), (jnp.float32, "f32")):
        for M in (196608,):
            for F in (16, 32):
                for nrows in (16384, 196608):
                    table = jnp.asarray(
                        rng.integers(-100, 100, size=(M, F)), dtype
                    )
                    idx = jnp.asarray(
                        rng.integers(0, M, size=(nrows,)), jnp.int32
                    )

                    @jax.jit
                    def xla_run(table, idx):
                        return jnp.sum(
                            jnp.take(table, idx, axis=0).astype(jnp.float32),
                            axis=-1,
                        )

                    _fence(xla_run(table, idx))
                    dt, ub = _timeit(lambda: xla_run(table, idx))
                    flag = " UB" if ub else ""
                    print(
                        f"XLA    hbm-take  {dname} M={M:6d} F={F} "
                        f"rows={nrows:6d}: {dt*1e3:7.3f} ms "
                        f"({dt/nrows*1e9:6.2f} ns/row){flag}",
                        flush=True,
                    )


# ---------------------------------------------------------------------------
# pcg
# ---------------------------------------------------------------------------

def pcg():
    import jax.numpy as jnp

    from mast3r_slam_tpu.lie import sim3
    from mast3r_slam_tpu.ops.global_gn import (
        GlobalGNSettings,
        gauss_newton_poses,
    )

    sys.path.insert(0, "tests")
    from oracle import arc_trajectory

    rng = np.random.default_rng(0)
    N = 64
    for M in (256, 512, 1024):
        gt = arc_trajectory(M, radius=2.0, max_angle=6.0)
        world = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32) + [0, 0, 3]
        Xs = np.stack(
            [
                np.asarray(
                    sim3.act(sim3.inv(jnp.asarray(gt[i])), jnp.asarray(world))
                )
                for i in range(M)
            ]
        )
        Cs = np.full((M, N, 1), 2.0, np.float32)
        e1 = [(i, i + 1) for i in range(M - 1)]
        loops = [(i, i + 64) for i in range(0, M - 64, 64)]
        pairs = e1 + [(b, a) for a, b in e1] + loops + [(b, a) for a, b in loops]
        ii = np.array([a for a, b in pairs], np.int32)
        jj = np.array([b for a, b in pairs], np.int32)
        E = len(ii)
        idx = np.tile(np.arange(N, dtype=np.int32), (E, 1))
        valid = np.ones((E, N, 1), bool)
        Q = np.full((E, N, 1), 2.0, np.float32)
        tau = rng.normal(size=(M, 7)).astype(np.float32) * 0.01
        tau[0] = 0
        noisy = np.asarray(sim3.retr(jnp.asarray(gt), jnp.asarray(tau)))

        for precond in ("block", "diag"):
            s = GlobalGNSettings(
                edge_batch=64, solver="pcg", max_iters=6, pcg_precond=precond
            )
            t0 = time.time()
            T, iters, ok, _ = gauss_newton_poses(
                jnp.asarray(noisy), jnp.asarray(Xs), jnp.asarray(Cs),
                jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(idx),
                jnp.asarray(valid), jnp.asarray(Q),
                jnp.eye(3, dtype=jnp.float32), (1, 1), s, "rays",
            )
            T = np.asarray(T)
            wall = time.time() - t0
            before = np.linalg.norm(noisy[:, :3] - gt[:, :3], axis=-1).mean()
            after = np.linalg.norm(T[:, :3] - gt[:, :3], axis=-1).mean()
            print(
                f"pcg M={M:5d} precond={precond:5s}: ok={bool(ok)} "
                f"iters={int(iters)} err {before:.4f} -> {after:.4f} "
                f"({wall:.1f}s incl compile)",
                flush=True,
            )


# ---------------------------------------------------------------------------
# cache
# ---------------------------------------------------------------------------

def cache():
    """Production-scale solve: full in-solve gather vs cached + refresh."""
    import jax
    import jax.numpy as jnp

    from mast3r_slam_tpu.ops.global_gn import (
        GlobalGNSettings,
        gauss_newton_poses,
        gauss_newton_poses_cached,
        precompute_edge_data,
    )
    from mast3r_slam_tpu.lie import sim3

    rng = np.random.default_rng(0)
    H, W = 384, 512
    N = H * W
    P = 16
    E_real = 32          # stored edges; two-way -> 64 solve rows
    half = 32
    STALE = 3            # steady-state: edges touching the current keyframe

    Twc = jnp.asarray(
        np.tile(np.asarray(sim3.identity()), (P, 1)), jnp.float32
    )
    Xs = jnp.asarray(
        np.abs(rng.normal(size=(P, N, 3)).astype(np.float32)) + 0.5
    )
    C_raw = jnp.asarray(
        np.abs(rng.normal(size=(P, N, 1)).astype(np.float32)) + 1.5
    )
    nf = jnp.ones((P,), jnp.int32)
    Cs = C_raw  # nf==1
    ii_e = rng.integers(0, P - 1, size=(E_real,)).astype(np.int32)
    jj_e = (ii_e + 1).astype(np.int32)
    ii2 = np.concatenate([ii_e, jj_e])
    jj2 = np.concatenate([jj_e, ii_e])
    idx_f = rng.integers(0, N, size=(E_real, N)).astype(np.int32)
    idx_b = rng.integers(0, N, size=(E_real, N)).astype(np.int32)
    idx2 = jnp.asarray(np.concatenate([idx_f, idx_b]))
    valid = jnp.ones((2 * E_real, N, 1), bool)
    Q = jnp.asarray(
        np.abs(rng.normal(size=(2 * E_real, N, 1)).astype(np.float32)) + 1.6
    )
    s = GlobalGNSettings(max_iters=2, edge_batch=8)
    args_common = (
        jnp.asarray(ii2), jnp.asarray(jj2), idx2, valid, Q,
        jnp.eye(3, dtype=jnp.float32), (H, W), s, "rays",
    )

    # uncached full solve
    def run_uncached():
        T, it, ok, _ = gauss_newton_poses(Twc, Xs, Cs, *args_common)
        return T

    _fence(run_uncached())
    dt_u, ub = _timeit(run_uncached, n1=2, n2=6, reps=3)
    print(f"uncached solve (E={2*E_real}, 2 GN iters): {dt_u*1e3:.1f} ms"
          + (" UB" if ub else ""), flush=True)

    # cached: build cache once (simulate with precompute on each half)
    from mast3r_slam_tpu.slam.factor_graph import _refresh_gather

    gf = jnp.ones((half, N, 4), jnp.float32)
    gb = jnp.ones((half, N, 4), jnp.float32)
    pos_all = jnp.arange(half, dtype=jnp.int32)
    gf, gb = _refresh_gather(
        gf, gb, Xs, C_raw, jnp.eye(3, dtype=jnp.float32),
        jnp.asarray(ii_e), jnp.asarray(jj_e),
        jnp.asarray(idx_f), jnp.asarray(idx_b), pos_all, (H, W), "rays",
    )
    _fence(gb)

    ii2_d = jnp.asarray(ii2)
    jj2_d = jnp.asarray(jj2)

    def run_cached():
        T, it, ok, _ = gauss_newton_poses_cached(
            Twc, Xs, C_raw, nf, ii2_d, jj2_d,
            gf, gb, idx2, valid, Q,
            jnp.eye(3, dtype=jnp.float32), (H, W), s, "rays",
        )
        return T

    _fence(run_cached())
    dt_c, ub = _timeit(run_cached, n1=2, n2=6, reps=3)
    print(f"cached solve   (E={2*E_real}, 2 GN iters): {dt_c*1e3:.1f} ms"
          + (" UB" if ub else ""), flush=True)

    # steady-state refresh cost (STALE edges) — device-resident args, as in
    # production (the graph's idx stores live on device; re-transferring
    # numpy slices per call measured the TUNNEL, not the kernel)
    pos_s = jnp.arange(STALE, dtype=jnp.int32)
    K_eye = jnp.eye(3, dtype=jnp.float32)
    ii_s = jnp.asarray(ii_e[:STALE])
    jj_s = jnp.asarray(jj_e[:STALE])
    if_s = jnp.asarray(idx_f[:STALE])
    ib_s = jnp.asarray(idx_b[:STALE])
    _fence(ib_s)

    def run_refresh():
        a, b = _refresh_gather(
            gf, gb, Xs, C_raw, K_eye, ii_s, jj_s, if_s, ib_s,
            pos_s, (H, W), "rays",
        )
        return b

    _fence(run_refresh())
    dt_r, ub = _timeit(run_refresh, n1=2, n2=6, reps=3)
    print(f"cache refresh  (S={STALE} stale edges):     {dt_r*1e3:.1f} ms"
          + (" UB" if ub else ""), flush=True)
    print(
        f"per-solve gather cost: uncached-extra {dt_u*1e3 - dt_c*1e3:.1f} ms"
        f" vs steady-state refresh {dt_r*1e3:.1f} ms",
        flush=True,
    )


def ivf():
    sys.path.insert(0, "scripts")
    from microbench_ivf import main as ivf_main

    ivf_main()


def gatherprobe2():
    """Mosaic's ONLY supported gather: same-shape take_along_axis
    (out[i,f] = tab[idx[i,f], f]; jax lowering.py:_gather_lowering_rule).
    For the FULL-N refine level, indices broadcast along F express exactly
    the row gather — probe compile + throughput vs array size."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    for dtype, dname in ((jnp.int8, "int8"), (jnp.float32, "f32")):
        for M, F in ((256, 128), (2048, 128), (8192, 128), (49152, 128),
                     (196608, 32), (196608, 128)):
            try:
                tab = jnp.asarray(rng.integers(-100, 100, size=(M, F)), dtype)
                idx = jnp.asarray(
                    rng.integers(0, M, size=(M, F)), jnp.int32
                )

                def kern(tab_ref, idx_ref, out_ref):
                    out_ref[:] = jnp.take_along_axis(
                        tab_ref[:], idx_ref[:], axis=0
                    )

                @jax.jit
                def run(tab, idx):
                    return pl.pallas_call(
                        kern,
                        out_shape=jax.ShapeDtypeStruct((M, F), dtype),
                        in_specs=[
                            pl.BlockSpec(memory_space=pltpu.VMEM),
                            pl.BlockSpec(memory_space=pltpu.VMEM),
                        ],
                        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    )(tab, idx)

                _fence(run(tab, idx))
                dt, ub = _timeit(lambda: run(tab, idx))
                flag = " UB" if ub else ""
                print(
                    f"pallas taa-gather {dname} ({M:6d},{F:3d}): "
                    f"{dt*1e3:7.3f} ms ({dt/M*1e9:6.2f} ns/row of {F}ch)"
                    f"{flag}",
                    flush=True,
                )
            except Exception as e:
                msg = str(e).replace("\n", " ")[:200]
                print(f"pallas taa-gather {dname} ({M},{F}): FAILED {msg}",
                      flush=True)


def pcg2():
    """Bisect the on-chip PCG GN-loop divergence: the TPU path differs from
    CPU in (a) the Pallas edge-block kernel (hg_impl auto->pallas on TPU,
    rays mode) and (b) MXU default-precision lowerings.  Sweep hg_impl and
    damping at M=512/block to see which axis restores convergence."""
    import jax.numpy as jnp

    from mast3r_slam_tpu.lie import sim3
    from mast3r_slam_tpu.ops.global_gn import (
        GlobalGNSettings,
        gauss_newton_poses,
    )

    sys.path.insert(0, "tests")
    from oracle import arc_trajectory

    rng = np.random.default_rng(0)
    N, M = 64, 512
    gt = arc_trajectory(M, radius=2.0, max_angle=6.0)
    world = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32) + [0, 0, 3]
    Xs = np.stack(
        [
            np.asarray(
                sim3.act(sim3.inv(jnp.asarray(gt[i])), jnp.asarray(world))
            )
            for i in range(M)
        ]
    )
    Cs = np.full((M, N, 1), 2.0, np.float32)
    e1 = [(i, i + 1) for i in range(M - 1)]
    loops = [(i, i + 64) for i in range(0, M - 64, 64)]
    pairs = e1 + [(b, a) for a, b in e1] + loops + [(b, a) for a, b in loops]
    ii = np.array([a for a, b in pairs], np.int32)
    jj = np.array([b for a, b in pairs], np.int32)
    E = len(ii)
    idx = np.tile(np.arange(N, dtype=np.int32), (E, 1))
    valid = np.ones((E, N, 1), bool)
    Q = np.full((E, N, 1), 2.0, np.float32)
    tau = rng.normal(size=(M, 7)).astype(np.float32) * 0.01
    tau[0] = 0
    noisy = np.asarray(sim3.retr(jnp.asarray(gt), jnp.asarray(tau)))
    before = np.linalg.norm(noisy[:, :3] - gt[:, :3], axis=-1).mean()

    for hg in ("pallas", "reduce", "dot"):
        for damp in (1e-4, 1e-2):
            for iters in (2, 6):
                s = GlobalGNSettings(
                    edge_batch=64, solver="pcg", max_iters=iters,
                    pcg_damping=damp, hg_impl=hg,
                )
                T, it, ok, _ = gauss_newton_poses(
                    jnp.asarray(noisy), jnp.asarray(Xs), jnp.asarray(Cs),
                    jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(idx),
                    jnp.asarray(valid), jnp.asarray(Q),
                    jnp.eye(3, dtype=jnp.float32), (1, 1), s, "rays",
                )
                after = np.linalg.norm(
                    np.asarray(T)[:, :3] - gt[:, :3], axis=-1
                ).mean()
                print(
                    f"pcg2 M={M} hg={hg:6s} damp={damp:g} iters={iters}: "
                    f"ok={bool(ok)} err {before:.4f} -> {after:.4f}",
                    flush=True,
                )


def pcg3():
    """Host-loop GN bisect: per iteration, compute the edge blocks and the
    PCG solve ON CHIP, and in parallel solve the SAME on-chip blocks in f64
    on the host.  Whichever quantity first departs (H_e/g_e, dx, or the
    retracted trajectory) names the culprit."""
    import jax
    import jax.numpy as jnp
    from functools import partial as _p

    from mast3r_slam_tpu.lie import sim3
    from mast3r_slam_tpu.ops.global_gn import (
        GlobalGNSettings,
        _assemble_and_solve_pcg,
        _edge_block_rays,
        precompute_edge_data,
    )

    sys.path.insert(0, "tests")
    from oracle import arc_trajectory

    rng = np.random.default_rng(0)
    N, M = 64, 512
    gt = arc_trajectory(M, radius=2.0, max_angle=6.0)
    world = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32) + [0, 0, 3]
    Xs = np.stack(
        [
            np.asarray(
                sim3.act(sim3.inv(jnp.asarray(gt[i])), jnp.asarray(world))
            )
            for i in range(M)
        ]
    )
    Cs = np.full((M, N, 1), 2.0, np.float32)
    e1 = [(i, i + 1) for i in range(M - 1)]
    loops = [(i, i + 64) for i in range(0, M - 64, 64)]
    pairs = e1 + [(b, a) for a, b in e1] + loops + [(b, a) for a, b in loops]
    ii = jnp.asarray(np.array([a for a, b in pairs], np.int32))
    jj = jnp.asarray(np.array([b for a, b in pairs], np.int32))
    E = len(pairs)
    idx = jnp.asarray(np.tile(np.arange(N, dtype=np.int32), (E, 1)))
    valid = jnp.ones((E, N, 1), bool)
    Q = jnp.full((E, N, 1), 2.0, jnp.float32)
    tau = rng.normal(size=(M, 7)).astype(np.float32) * 0.01
    tau[0] = 0
    Twc = jnp.asarray(np.asarray(sim3.retr(jnp.asarray(gt), jnp.asarray(tau))))

    s = GlobalGNSettings(edge_batch=64, solver="pcg", hg_impl="reduce")
    pre = precompute_edge_data(Xs, Cs, ii, jj, idx, valid, Q, s, "rays", (1, 1))
    Xi, Xj, sq, ut, vt = pre

    @jax.jit
    def blocks(Twc_):
        return jax.lax.map(
            _p(_edge_block_rays, Twc_, s),
            (ii, jj, Xi, Xj, sq, ut, vt),
            batch_size=64,
        )

    @jax.jit
    def solve_chip(He, ge):
        return _assemble_and_solve_pcg(
            He, ge, ii, jj, M, 1, s.pcg_iters, s.pcg_tol, s.pcg_damping,
            "block",
        )

    ii_np = np.asarray(ii)
    jj_np = np.asarray(jj)

    def solve_f64(He, ge):
        He = np.asarray(He, np.float64)
        ge = np.asarray(ge, np.float64)
        Mfree = M - 1
        io = np.where(ii_np - 1 >= 0, ii_np - 1, Mfree)
        jo = np.where(jj_np - 1 >= 0, jj_np - 1, Mfree)
        Hb = np.zeros((Mfree + 1, Mfree + 1, 7, 7))
        np.add.at(Hb, (io, io), He)
        np.add.at(Hb, (jo, jo), He)
        np.add.at(Hb, (io, jo), -He)
        np.add.at(Hb, (jo, io), -He)
        gb = np.zeros((Mfree + 1, 7))
        np.add.at(gb, io, -ge)
        np.add.at(gb, jo, ge)
        Hd = Hb[:Mfree, :Mfree].transpose(0, 2, 1, 3).reshape(
            7 * Mfree, 7 * Mfree
        )
        gd = gb[:Mfree].reshape(-1)
        # same relative Levenberg damping as the chip path
        D = np.zeros((Mfree, 7, 7))
        np.add.at(D, io[io < Mfree], He[io < Mfree])
        np.add.at(D, jo[jo < Mfree], He[jo < Mfree])
        tr = np.trace(D, axis1=-2, axis2=-1) / 7.0
        lam = (s.pcg_damping + 1e-6) * np.maximum(tr, 1e-12)
        Hd = Hd + np.kron(np.diag(lam), np.eye(7))
        dx = np.linalg.solve(Hd, -gd)
        return dx.reshape(Mfree, 7)

    def err_of(T):
        return np.linalg.norm(
            np.asarray(T)[:, :3] - gt[:, :3], axis=-1
        ).mean()

    T_chip = Twc      # trajectory driven by on-chip dx
    T_hyb = Twc       # trajectory driven by f64 dx of on-chip blocks
    for it in range(8):
        He_c, ge_c = blocks(T_chip)
        dx_c, okc = solve_chip(He_c, ge_c)
        dx_f = solve_f64(He_c, ge_c)
        dxc = np.asarray(dx_c, np.float64)
        dd = np.linalg.norm(dxc - dx_f) / max(np.linalg.norm(dx_f), 1e-12)
        # hybrid trajectory advances with its own blocks + f64 solve
        He_h, ge_h = blocks(T_hyb)
        dx_h = solve_f64(He_h, ge_h)
        retr = jax.jit(sim3.retr)
        pad = lambda d: jnp.concatenate(
            [jnp.zeros((1, 7), jnp.float32), jnp.asarray(d, jnp.float32)]
        )
        T_chip = retr(T_chip, pad(dx_c))
        T_hyb = retr(T_hyb, pad(dx_h))
        print(
            f"pcg3 it={it}: |dx_chip|={np.linalg.norm(dxc):.3e} "
            f"|dx_f64|={np.linalg.norm(dx_f):.3e} rel|d|={dd:.3e} "
            f"err_chip={err_of(T_chip):.4f} err_hyb={err_of(T_hyb):.4f} "
            f"ok={bool(okc)}",
            flush=True,
        )


def _pcg4_problem():
    import jax.numpy as jnp

    from mast3r_slam_tpu.lie import sim3

    sys.path.insert(0, "tests")
    from oracle import arc_trajectory

    rng = np.random.default_rng(0)
    N, M = 64, 512
    gt = arc_trajectory(M, radius=2.0, max_angle=6.0)
    world = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32) + [0, 0, 3]
    Xs = np.stack(
        [
            np.asarray(
                sim3.act(sim3.inv(jnp.asarray(gt[i])), jnp.asarray(world))
            )
            for i in range(M)
        ]
    )
    Cs = np.full((M, N, 1), 2.0, np.float32)
    e1 = [(i, i + 1) for i in range(M - 1)]
    loops = [(i, i + 64) for i in range(0, M - 64, 64)]
    pairs = e1 + [(b, a) for a, b in e1] + loops + [(b, a) for a, b in loops]
    ii = np.array([a for a, b in pairs], np.int32)
    jj = np.array([b for a, b in pairs], np.int32)
    E = len(pairs)
    idx = np.tile(np.arange(N, dtype=np.int32), (E, 1))
    valid = np.ones((E, N, 1), bool)
    Q = np.full((E, N, 1), 2.0, np.float32)
    tau = rng.normal(size=(M, 7)).astype(np.float32) * 0.01
    tau[0] = 0
    T0 = np.asarray(sim3.retr(jnp.asarray(gt), jnp.asarray(tau)))
    return gt, T0, Xs, Cs, ii, jj, idx, valid, Q, M, N


def _pcg4_fns(Xs, Cs, ii, jj, idx, valid, Q, M):
    import jax
    import jax.numpy as jnp
    from functools import partial as _p

    from mast3r_slam_tpu.lie import sim3
    from mast3r_slam_tpu.ops.global_gn import (
        GlobalGNSettings,
        _edge_block_rays,
        precompute_edge_data,
    )

    s = GlobalGNSettings(edge_batch=64, solver="pcg", hg_impl="reduce")
    ii_j = jnp.asarray(ii)
    jj_j = jnp.asarray(jj)
    pre = precompute_edge_data(
        jnp.asarray(Xs), jnp.asarray(Cs), ii_j, jj_j, jnp.asarray(idx),
        jnp.asarray(valid), jnp.asarray(Q), s, "rays", (1, 1),
    )

    @jax.jit
    def blocks(Twc_):
        return jax.lax.map(
            _p(_edge_block_rays, Twc_, s),
            (ii_j, jj_j) + tuple(pre),
            batch_size=64,
        )

    @jax.jit
    def retr_pad(T, d):
        return sim3.retr(
            T,
            jnp.concatenate(
                [jnp.zeros((1, 7), jnp.float32), jnp.asarray(d, jnp.float32)]
            ),
        )

    def solve_f64(He, ge):
        He = np.asarray(He, np.float64)
        ge = np.asarray(ge, np.float64)
        Mfree = M - 1
        io = np.where(ii - 1 >= 0, ii - 1, Mfree)
        jo = np.where(jj - 1 >= 0, jj - 1, Mfree)
        Hb = np.zeros((Mfree + 1, Mfree + 1, 7, 7))
        np.add.at(Hb, (io, io), He)
        np.add.at(Hb, (jo, jo), He)
        np.add.at(Hb, (io, jo), -He)
        np.add.at(Hb, (jo, io), -He)
        gb = np.zeros((Mfree + 1, 7))
        np.add.at(gb, io, -ge)
        np.add.at(gb, jo, ge)
        Hd = Hb[:Mfree, :Mfree].transpose(0, 2, 1, 3).reshape(
            7 * Mfree, 7 * Mfree
        )
        gd = gb[:Mfree].reshape(-1)
        D = np.zeros((Mfree, 7, 7))
        np.add.at(D, io[io < Mfree], He[io < Mfree])
        np.add.at(D, jo[jo < Mfree], He[jo < Mfree])
        tr = np.trace(D, axis1=-2, axis2=-1) / 7.0
        lam = 1e-4 * np.maximum(tr, 1e-12)
        Hd = Hd + np.kron(np.diag(lam), np.eye(7))
        return np.linalg.solve(Hd, -gd).reshape(Mfree, 7)

    return blocks, retr_pad, solve_f64


def pcg4ref():
    """CPU reference: GN trajectory + per-iteration blocks/dx -> npz."""
    gt, T0, Xs, Cs, ii, jj, idx, valid, Q, M, N = _pcg4_problem()
    blocks, retr_pad, solve_f64 = _pcg4_fns(Xs, Cs, ii, jj, idx, valid, Q, M)
    T = T0
    Ts, Hes, ges, dxs = [], [], [], []
    for it in range(6):
        He, ge = blocks(T)
        dx = solve_f64(He, ge)
        Ts.append(np.asarray(T))
        Hes.append(np.asarray(He))
        ges.append(np.asarray(ge))
        dxs.append(dx)
        T = np.asarray(retr_pad(T, dx))
        err = np.linalg.norm(T[:, :3] - gt[:, :3], axis=-1).mean()
        print(f"pcg4ref it={it}: |dx|={np.linalg.norm(dx):.3e} err={err:.4f}",
              flush=True)
    np.savez(
        "/tmp/pcg4_ref.npz",
        T=np.stack(Ts), He=np.stack(Hes), ge=np.stack(ges),
        dx=np.stack(dxs),
    )
    print("saved /tmp/pcg4_ref.npz", flush=True)


def pcg4cmp():
    """TPU: evaluate blocks/solve at the SAME states as the CPU reference —
    function-level comparison immune to chaotic trajectory amplification."""
    import jax.numpy as jnp

    gt, T0, Xs, Cs, ii, jj, idx, valid, Q, M, N = _pcg4_problem()
    blocks, retr_pad, solve_f64 = _pcg4_fns(Xs, Cs, ii, jj, idx, valid, Q, M)
    ref = np.load("/tmp/pcg4_ref.npz")
    for it in range(ref["T"].shape[0]):
        T = jnp.asarray(ref["T"][it])
        He, ge = blocks(T)
        He = np.asarray(He, np.float64)
        ge = np.asarray(ge, np.float64)
        dHe = np.linalg.norm(He - ref["He"][it]) / max(
            np.linalg.norm(ref["He"][it]), 1e-12
        )
        dge = np.linalg.norm(ge - ref["ge"][it]) / max(
            np.linalg.norm(ref["ge"][it]), 1e-12
        )
        dx_of_tpu_blocks = solve_f64(He, ge)
        ddx = np.linalg.norm(dx_of_tpu_blocks - ref["dx"][it]) / max(
            np.linalg.norm(ref["dx"][it]), 1e-12
        )
        # retraction check: retract the CPU state by the CPU dx ON CHIP
        T_next = np.asarray(retr_pad(T, ref["dx"][it]), np.float64)
        if it + 1 < ref["T"].shape[0]:
            dT = np.abs(T_next - ref["T"][it + 1]).max()
        else:
            dT = float("nan")
        print(
            f"pcg4cmp it={it}: rel|dHe|={dHe:.3e} rel|dge|={dge:.3e} "
            f"rel|ddx(f64 of chip blocks)|={ddx:.3e} max|dretr|={dT:.3e}",
            flush=True,
        )


def retrprobe():
    """Confirm the retraction root cause: evaluate sim3.exp ON CHIP at the
    exact GN steps recorded by pcg4ref and compare the translation part
    against an f64 scipy expm oracle; report the worst poses + their
    (sigma, theta) — the W-coefficient cancellation region."""
    import jax.numpy as jnp
    from scipy.linalg import expm

    from mast3r_slam_tpu.lie import sim3

    ref = np.load("/tmp/pcg4_ref.npz")
    for it in range(ref["dx"].shape[0]):
        dx = ref["dx"][it].astype(np.float32)  # (M-1, 7)
        T_chip = np.asarray(sim3.exp(jnp.asarray(dx)), np.float64)

        # f64 oracle via matrix exponential of [[sigma I + [phi]x, tau],[0,0]]
        t64 = np.zeros((len(dx), 3))
        for i, xi in enumerate(dx.astype(np.float64)):
            tau, phi, sg = xi[0:3], xi[3:6], xi[6]
            P = np.array(
                [[0, -phi[2], phi[1]], [phi[2], 0, -phi[0]],
                 [-phi[1], phi[0], 0]]
            )
            M4 = np.zeros((4, 4))
            M4[:3, :3] = sg * np.eye(3) + P
            M4[:3, 3] = tau
            t64[i] = expm(M4)[:3, 3]
        err = np.abs(T_chip[:, 0:3] - t64).max(axis=-1)
        w = int(np.argmax(err))
        xi = dx[w].astype(np.float64)
        sg = xi[6]
        th = np.linalg.norm(xi[3:6])
        print(
            f"retrprobe it={it}: max|t_chip - t_f64|={err.max():.3e} "
            f"(pose {w}: sigma={sg:.3e} theta={th:.3e} |tau|="
            f"{np.linalg.norm(xi[:3]):.3e}); p99={np.percentile(err,99):.3e}",
            flush=True,
        )


SECTIONS = {
    "gatherprobe": gatherprobe,
    "gatherprobe2": gatherprobe2,
    "pcg2": pcg2,
    "pcg3": pcg3,
    "pcg4ref": pcg4ref,
    "pcg4cmp": pcg4cmp,
    "retrprobe": retrprobe,
    "pcg": pcg,
    "cache": cache,
    "ivf": ivf,
}


if __name__ == "__main__":
    names = sys.argv[1:] or ["gatherprobe"]
    for n in names:
        print(f"==== {n} ====", flush=True)
        t0 = time.time()
        SECTIONS[n]()
        print(f"==== {n} done in {time.time()-t0:.0f}s ====", flush=True)
