"""Edge-sharded global bundle adjustment over a device mesh.

The distributed form of :func:`mast3r_slam_tpu.ops.global_gn.gauss_newton_poses`:
edges (and their dense per-pixel correspondence fields) are sharded across the
``edges`` mesh axis; every device accumulates the 7x7 pose blocks for ITS
edges, a single ``psum`` over ICI reduces the assembled normal equations, and
the (small, replicated) dense solve + retraction runs on every device.

This is the scaling-book recipe for the reference's `SparseBlock` reduction
(gn_kernels.cu:1199-1206): the scatter over (ii, jj) pairs becomes a local
scatter + cross-device psum instead of a CPU Eigen roundtrip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..lie import sim3
from ..ops.global_gn import (
    GlobalGNSettings,
    _edge_block_calib,
    _edge_block_points,
    _edge_block_rays,
    precompute_edge_data,
)
from .mesh import EDGE_AXIS


def _local_blocks(Twc, K, img_hw, settings, mode, ii, jj, edge_data):
    """Accumulate this shard's edge blocks into dense (M+1,..) scatter arrays."""
    P_total = Twc.shape[0]
    pin = settings.pin
    M = P_total - pin

    if mode == "rays":
        block_fn = lambda edge: _edge_block_rays(Twc, settings, edge)
    elif mode == "points":
        block_fn = lambda edge: _edge_block_points(Twc, settings, edge)
    else:
        block_fn = lambda edge: _edge_block_calib(Twc, K, img_hw, settings, edge)

    Xi, Xj, sq, ut, vt = edge_data
    H_e, g_e, c_e = jax.lax.map(
        block_fn, (ii, jj, Xi, Xj, sq, ut, vt), batch_size=settings.edge_batch
    )

    io = jnp.where(ii - pin >= 0, ii - pin, M)
    jo = jnp.where(jj - pin >= 0, jj - pin, M)
    Hbig = jnp.zeros((M + 1, M + 1, 7, 7), dtype=jnp.float32)
    Hbig = Hbig.at[io, io].add(H_e)
    Hbig = Hbig.at[jo, jo].add(H_e)
    Hbig = Hbig.at[io, jo].add(-H_e)
    Hbig = Hbig.at[jo, io].add(-H_e)
    gbig = jnp.zeros((M + 1, 7), dtype=jnp.float32)
    gbig = gbig.at[io].add(-g_e)
    gbig = gbig.at[jo].add(g_e)
    return Hbig, gbig, jnp.sum(c_e)


def _solve_dense(Hbig, gbig, P_total: int, pin: int, damping: float = 1e-4):
    """Replicated dense solve from assembled blocks (cf. _assemble_and_solve;
    same relative Levenberg damping keeping the f32 factor PD on large
    graphs)."""
    M = P_total - pin
    Hd = Hbig[:M, :M].transpose(0, 2, 1, 3).reshape(7 * M, 7 * M)
    gd = gbig[:M].reshape(7 * M)
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(Hd), 1e-12))
    d_inv = 1.0 / d
    Hs = Hd * d_inv[:, None] * d_inv[None, :]
    Hs = Hs + jnp.eye(7 * M, dtype=jnp.float32) * (damping + 1e-8)
    L, lower = jax.scipy.linalg.cho_factor(Hs, lower=True)
    y = jax.scipy.linalg.cho_solve((L, lower), gd * d_inv)
    dx = -(d_inv * y)
    ok = jnp.isfinite(dx).all()
    return jnp.where(ok, dx, 0.0).reshape(M, 7), ok


def gauss_newton_poses_sharded(
    mesh: Mesh,
    Twc,
    Xs,
    Cs,
    ii,
    jj,
    idx_ii2jj,
    valid_match,
    Q,
    K,
    img_hw,
    settings: GlobalGNSettings,
    mode: str = "rays",
):
    """Distributed GN: edge arrays sharded on `edges` axis, rest replicated.

    Edge count must be divisible by the mesh size (pad with valid=False
    edges).  Returns (Twc', iters, ok, diverged) — replicated; `diverged`
    is the monotone-cost health guard's flag (cf. ops.global_gn._gn_core).
    """
    P_total = Twc.shape[0]
    pin = settings.pin

    espec = P(EDGE_AXIS)
    rspec = P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(rspec, rspec, rspec, espec, espec, espec, espec, espec),
        out_specs=(espec, espec, espec, espec, espec),
    )
    def precompute(Xs_, Cs_, K_, ii_, jj_, idx_, valid_, Q_):
        return precompute_edge_data(
            Xs_, Cs_, ii_, jj_, idx_, valid_, Q_, settings, mode, img_hw
        )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(rspec, rspec, espec, espec) + (espec,) * 5,
        out_specs=(rspec, rspec, rspec),
    )
    def accumulate(Twc_, K_, ii_, jj_, Xi_, Xj_, sq_, ut_, vt_):
        Hbig, gbig, cost = _local_blocks(
            Twc_, K_, img_hw, settings, mode, ii_, jj_, (Xi_, Xj_, sq_, ut_, vt_)
        )
        # one ICI collective reduces the normal equations across the mesh
        Hbig = jax.lax.psum(Hbig, EDGE_AXIS)
        gbig = jax.lax.psum(gbig, EDGE_AXIS)
        cost = jax.lax.psum(cost, EDGE_AXIS)
        return Hbig, gbig, cost

    @jax.jit
    def run(Twc0, Xs_, Cs_, K_, ii_, jj_, idx_, valid_, Q_):
        # correspondence gathers are pose-independent: once, before the loop
        edge_data = precompute(Xs_, Cs_, K_, ii_, jj_, idx_, valid_, Q_)

        def one_iter(Twc_):
            Hbig, gbig, cost = accumulate(Twc_, K_, ii_, jj_, *edge_data)
            dx, ok = _solve_dense(Hbig, gbig, P_total, pin,
                                  settings.pcg_damping)
            dx_full = jnp.concatenate(
                [jnp.zeros((pin, 7), dtype=dx.dtype), dx], axis=0
            )
            Twc_new = sim3.retr(Twc_, dx_full)
            keep = jnp.arange(P_total)[:, None] >= pin
            return (jnp.where(keep, Twc_new, Twc_),
                    jnp.sqrt(jnp.sum(dx * dx)), ok, cost)  # VPU reduce

        # monotone-cost health guard — same semantics as the single-device
        # loop (ops.global_gn._gn_core): a cost-increasing step reverts to
        # the last good poses and raises `diverged`
        def cond(state):
            _, _, it, delta, ok, _, div = state
            return (
                (it < settings.max_iters)
                & (delta >= settings.delta_norm)
                & ok
                & ~div
            )

        def body(state):
            Twc_, Twc_prev, it, _, _, prev_cost, _ = state
            Twc_new, delta, ok, cost = one_iter(Twc_)
            worse = cost > prev_cost * 1.01
            return (jnp.where(worse, Twc_prev, Twc_new), Twc_, it + 1,
                    delta, ok, jnp.where(worse, prev_cost, cost), worse)

        init = (
            Twc0,
            Twc0,
            jnp.asarray(0, jnp.int32),
            jnp.asarray(jnp.inf, jnp.float32),
            jnp.asarray(True),
            jnp.asarray(jnp.inf, jnp.float32),
            jnp.asarray(False),
        )
        Twc_out, _, iters, _, ok, _, diverged = jax.lax.while_loop(
            cond, body, init
        )
        return Twc_out, iters, ok, diverged

    return run(Twc, Xs, Cs, K, ii, jj, idx_ii2jj, valid_match, Q)
