"""Keyframe factor graph with dense per-edge correspondence fields.

Capability mirror of /root/reference/mast3r_slam/global_opt.py: adding factors
runs batched symmetric two-view inference + dense matching and gates edges by
bidirectional match fraction; solving runs the global GN over all keyframe
poses.

TPU shape: edge state lives in fixed-capacity device arrays (static jit
signatures); batch sizes (edges added per call, edges/poses in a solve) are
padded to power-of-two buckets so the engine compiles a handful of programs
once and streams thereafter.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import matching
from ..ops.global_gn import (
    GlobalGNSettings,
    gauss_newton_poses,
    gauss_newton_poses_cached,
)
from .frame import Keyframes


def _bucket(n: int, lo: int = 1) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


@jax.jit
def _store_edges(idx_f, idx_b, vf, vb, qf, qb, rows,
                 n_if, n_ib, n_vf, n_vb, n_qf, n_qb):
    """ONE dispatch for the six edge-store writes (12 separate scatter +
    gather ops otherwise — material per backend task over a remote tunnel).
    `rows` (B,) int32: target edge rows — contiguous for plain appends,
    arbitrary when recycled rows are reused (edge-row freelist, the
    long-video edge-memory bound).  Compiles once per B."""
    return (
        idx_f.at[rows].set(n_if),
        idx_b.at[rows].set(n_ib),
        vf.at[rows].set(n_vf),
        vb.at[rows].set(n_vb),
        qf.at[rows].set(n_qf),
        qb.at[rows].set(n_qb),
    )


@jax.jit
def _store_edges_oneway(idx_f, idx_b, vf, vb, qf, qb, rows,
                        n_if, n_vf, n_qf):
    """Edge-store write for forward-only factors, one dispatch: the backward
    half-row is zeroed in-program (idx 0 / valid False / Q 0 — zero-weight in
    the scatter-assembled solve, finite under the gathered-point cache)."""
    return (
        idx_f.at[rows].set(n_if),
        idx_b.at[rows].set(jnp.zeros_like(n_if)),
        vf.at[rows].set(n_vf),
        vb.at[rows].set(jnp.zeros_like(n_vf)),
        qf.at[rows].set(n_qf),
        qb.at[rows].set(jnp.zeros_like(n_qf)),
    )


@jax.jit
def _store_edges_gated(idx_f, idx_b, vf, vb, qf, qb, rows,
                       n_if, n_ib, n_vf, n_vb, n_qf, n_qb,
                       frac_j, frac_i, consec, thresh):
    """`_store_edges` with the bidirectional match-fraction gate computed ON
    DEVICE (local_opt.speculative_gate): every candidate edge is stored, but
    a rejected one has its weight fields masked to zero in the same dispatch
    — solve-identical to not storing it, and the host never blocks on the
    fractions (VERDICT r4 item 2).  Returns the per-edge keep verdict as a
    device array for lazy host bookkeeping (resolve_pending_verdicts)."""
    keep = consec | (jnp.minimum(frac_j, frac_i) >= thresh)
    m = keep[:, None, None]
    mq = m.astype(qf.dtype)
    return (
        idx_f.at[rows].set(n_if),
        idx_b.at[rows].set(n_ib),
        vf.at[rows].set(n_vf & m),
        vb.at[rows].set(n_vb & m),
        qf.at[rows].set(n_qf * mq),
        qb.at[rows].set(n_qb * mq),
    ), keep


@jax.jit
def _store_edges_oneway_gated(idx_f, idx_b, vf, vb, qf, qb, rows,
                              n_if, n_vf, n_qf, frac_j, thresh):
    """`_store_edges_oneway` with the forward-fraction gate computed on
    device (speculative gating of one-way loop-closure candidates)."""
    keep = frac_j >= thresh
    m = keep[:, None, None]
    mq = m.astype(qf.dtype)
    return (
        idx_f.at[rows].set(n_if),
        idx_b.at[rows].set(jnp.zeros_like(n_if)),
        vf.at[rows].set(n_vf & m),
        vb.at[rows].set(jnp.zeros_like(n_vf)),
        qf.at[rows].set(n_qf * mq),
        qb.at[rows].set(jnp.zeros_like(n_qf)),
    ), keep


@jax.jit
def _zero_edge_rows(vf, vb, qf, qb, rows):
    """Zero-weight recycled edge rows in one dispatch: valid False / Q 0
    makes them exact no-ops in the scatter-assembled solve until reused."""
    zb = jnp.zeros((rows.shape[0],) + vf.shape[1:], vf.dtype)
    zq = jnp.zeros((rows.shape[0],) + qf.shape[1:], qf.dtype)
    return (vf.at[rows].set(zb), vb.at[rows].set(zb),
            qf.at[rows].set(zq), qb.at[rows].set(zq))


@partial(jax.jit, static_argnames=("img_hw", "mode"))
def _refresh_gather(gf, gb, Xs, C_raw, K, eii, ejj, idx_f, idx_b, pos,
                    img_hw, mode: str):
    """Re-gather the cached correspondence rows of STALE edges, one dispatch.

    The per-pixel gather `XsC[kf] at idx` is pose-independent; between two
    solves only keyframes the tracker fused into (plus freshly added edges)
    change, so the graph re-gathers just those edges' rows (BASELINE.md r3:
    full gather ~288 ms/solve at 128 edges; steady-state stale set is the
    few edges touching the current keyframe).

    gf/gb: (cap, N, 4) cache arrays; eii/ejj (S,) source keyframes;
    idx_f/idx_b (S, N) match indices; pos (S,) cache rows to write
    (duplicates allowed — identical values).  Stores RAW C (normalisation
    happens at solve time) and, in calib mode, ray-constrained X.
    """
    XsC = jnp.concatenate(
        [jnp.asarray(Xs, jnp.float32), jnp.asarray(C_raw, jnp.float32)],
        axis=-1,
    )
    rows_i = XsC[eii]  # (S, N, 4) wide-row gather, cheap
    rows_j = XsC[ejj]
    if mode == "calib":
        from ..geometry import constrain_points_to_ray

        def con(rows):
            X = jax.vmap(
                lambda r: constrain_points_to_ray(img_hw, r[..., :3], K)
            )(rows)
            return jnp.concatenate([X, rows[..., 3:]], axis=-1)

        rows_i = con(rows_i)
        rows_j = con(rows_j)
    new_f = jnp.take_along_axis(rows_i, idx_f[..., None], axis=1)
    new_b = jnp.take_along_axis(rows_j, idx_b[..., None], axis=1)
    return gf.at[pos].set(new_f), gb.at[pos].set(new_b)


@jax.jit
def _expand_two_way_subset(idx_f, idx_b, vf, vb, qf, qb, kidx, kmask):
    """Two-way expansion of an arbitrary EDGE SUBSET in one dispatch.

    kidx (half,) int32 edge rows to keep (padded with 0), kmask (half,) bool.
    Output layout [forward(kidx) | backward(kidx)] — the windowed solve's
    analog of :func:`_expand_two_way` (which assumes the kept edges are the
    contiguous prefix).  Rows with kmask=False carry valid=False and
    contribute nothing to the scatter-assembled solve."""
    m = kmask[:, None, None]
    idx = jnp.concatenate([idx_f[kidx], idx_b[kidx]])
    valid = jnp.concatenate([vf[kidx] & m, vb[kidx] & m])
    Q = jnp.concatenate([qf[kidx], qb[kidx]])
    return idx, valid, Q


@partial(jax.jit, static_argnames=("half",))
def _expand_two_way(idx_f, idx_b, vf, vb, qf, qb, e_count, half):
    """Two-way edge expansion in ONE dispatch.

    Layout [forward(0..half) | backward(0..half)] with rows >= e_count
    masked invalid — the solve is row-order-invariant (scatter-assembled)
    and zero-weight rows contribute nothing, so this replaces the previous
    9-dispatch zeros+set packing of [f(0..E) | b(0..E)]."""
    mask = (jnp.arange(half) < e_count)[:, None, None]
    idx = jnp.concatenate([idx_f[:half], idx_b[:half]])
    valid = jnp.concatenate([vf[:half] & mask, vb[:half] & mask])
    Q = jnp.concatenate([qf[:half], qb[:half]])
    return idx, valid, Q


class FactorGraph:
    def __init__(self, model, cfg, keyframes: Keyframes,
                 img_hw: Tuple[int, int], K=None, edge_capacity: int = 1024,
                 mesh=None):
        self.model = model
        self.cfg = cfg
        self.lcfg = cfg["local_opt"]
        self.settings = GlobalGNSettings.from_config(cfg)
        self.keyframes = keyframes
        self.img_hw = img_hw
        # pipeline mode: the keyframe store's pointmap side is committed to
        # the tracker chip; edge fields feed the same solve, so they are
        # committed there too (transfer once at add time, off the hot path)
        self._dev = (
            (lambda a: jax.device_put(a, keyframes.device))
            if getattr(keyframes, "device", None) is not None
            else (lambda a: a)
        )
        # Optional jax.sharding.Mesh: when set, solve() runs the edge-sharded
        # distributed GN (parallel/sharded_ba.py) and add_factors shards the
        # symmetric-decode batch over the same `edges` axis.  This is the
        # engine-mode form of the reference's whole-backend scaling target
        # (gn_kernels.cu:1199-1206 SparseBlock reduction).
        self.mesh = mesh
        self.K = K if K is not None else jnp.eye(3, dtype=jnp.float32)
        # windowing (local_opt.window_size): bound on FREE poses per solve.
        # Beyond it, only the most recent `window_size` keyframes are
        # optimised; older poses referenced by surviving edges enter the
        # solve as PINNED context (the honest f32 recipe for beyond-
        # reference-scale graphs — BASELINE.md r3: chain condition numbers
        # grow O(M^2) past what any on-chip f32 solve resolves; the
        # reference leans on f64 Eigen, gn_kernels.cu:57-159, and caps the
        # session at 512 keyframes, frame.py:221).
        self.window_size = int(float(self.lcfg.get("window_size", 0) or 0))
        N = img_hw[0] * img_hw[1]
        self.N = N
        self.capacity = edge_capacity
        self.n_edges = 0
        # SoA edge store (global_opt.py:17-28, fixed capacity)
        self.ii = np.zeros((edge_capacity,), dtype=np.int32)
        self.jj = np.zeros((edge_capacity,), dtype=np.int32)
        self.idx_ii2jj = jnp.zeros((edge_capacity, N), dtype=jnp.int32)
        self.idx_jj2ii = jnp.zeros((edge_capacity, N), dtype=jnp.int32)
        self.valid_match_j = jnp.zeros((edge_capacity, N, 1), dtype=bool)
        self.valid_match_i = jnp.zeros((edge_capacity, N, 1), dtype=bool)
        self.Q_ii2jj = jnp.zeros((edge_capacity, N, 1), dtype=jnp.float32)
        self.Q_jj2ii = jnp.zeros((edge_capacity, N, 1), dtype=jnp.float32)
        # gathered-point cache (BASELINE.md r3 lever): per-edge [X|C] rows
        # gathered at the match indices, refreshed only when the source
        # keyframe's pointmap version changed.  ~2*N*16 B per edge
        # (~6.3 MB/edge at 384x512) — bounded by gather_cache_max_edges,
        # beyond which solves fall back to in-solve gathering.
        self._gcache_on = bool(self.lcfg.get("gather_cache", True))
        self._gcache_max = int(self.lcfg.get("gather_cache_max_edges", 256))
        self._gf = None  # (cache_cap, N, 4) f32
        self._gb = None
        self._gcache_cap = 0
        self._stamp_f = np.full((edge_capacity,), -1, dtype=np.int64)
        self._stamp_b = np.full((edge_capacity,), -1, dtype=np.int64)
        # speculative gating (local_opt.speculative_gate): per-slot liveness
        # + pending on-device verdicts (slot_start, count, keep device array)
        self.edge_live = np.ones((edge_capacity,), dtype=bool)
        self._pending: List[tuple] = []
        # solver health guard: the last PCG-routed solve's on-device
        # `diverged` flag (checked lazily at the next solve — see solve())
        self._health_pending = None
        self.n_recoveries = 0  # windowed-dense recovery solves triggered
        # edge-row freelist (long-video edge-memory bound): rows of edges
        # recycled by _recycle_old_edges, reused before growing the arrays
        self._free_edge_rows: List[int] = []
        self.n_edges_recycled = 0
        # backend pixel budget (local_opt.pixel_stride, default 1 =
        # reference-exact): match factor-graph edges on an s-strided source
        # grid — N/s^2 per-pixel LM problems + descriptor windows per edge,
        # scattered back into the full-shape edge fields (rows off the
        # strided grid carry valid=False; the solve sees a sparser but
        # statistically equivalent constraint set).  The tracker always
        # matches at full resolution.
        self._pstride = max(1, int(self.lcfg.get("pixel_stride", 1)))

    # ------------------------------------------------------------------
    # add factors
    # ------------------------------------------------------------------

    def add_factors(self, ii: List[int], jj: List[int], min_match_frac: float,
                    is_reloc: bool = False, strict: bool = None,
                    captures=None) -> bool:
        """Run symmetric inference+matching for kf pairs, gate, store.

        Mirrors global_opt.py:30-102 (including the rule that consecutive
        edges are always kept and reloc requires every edge to pass).

        ``is_reloc`` marks a RELOCALIZATION call: it always takes the
        bidirectional symmetric path regardless of the speed knobs below
        (the documented invariant in base.yaml — ADVICE r4).  ``strict``
        is the separate all-or-nothing acceptance rule (the reference's
        own ``is_reloc`` argument, global_opt.py:76-77), controlled by
        ``reloc.strict``; it defaults to ``is_reloc``.

        With ``local_opt.oneway_nonconsec`` set (speed knob, default off =
        reference-exact), NON-consecutive candidates — retrieval-proposed
        loop closures — run ONE asymmetric decode + forward-only matching
        instead of the symmetric both-directions pass, roughly halving the
        backend's per-candidate device cost (the two dominant ledger rows,
        BASELINE.md r4: symmetric decode ~87 ms + matching ~130 ms/task).
        The stored backward half-row is zero-weight in the solve and the
        edge gate uses the forward match fraction only.  Reloc always uses
        the strict bidirectional path regardless of the knob.

        With ``local_opt.reuse_tracker_match`` set (speed knob, default
        off) and a matching entry in `captures` ({(i, j): (idx, valid, Q)}
        device arrays from the tracker), a CONSECUTIVE pair stores the
        capture as its backward direction and runs only the forward decode
        + matching — the tracker already computed the backward match when
        frame j was created (same matcher, same `matching:` settings,
        warm-started instead of identity-init; the reference recomputes it,
        global_opt.py:49).  The edge stays a full bidirectional factor.
        """
        B = len(ii)
        if B == 0:
            return False
        if strict is None:
            strict = is_reloc
        # keyframe paging: loop-closure / reloc candidates may be evicted —
        # re-materialise them before taking the snapshot (no-op when
        # everything is resident)
        if self.keyframes.paging:
            self.keyframes.ensure_resident(set(ii) | set(jj))
        # snapshot: the symmetric decode + matching below is the backend's
        # single most expensive stretch — it must not hold any lock
        snap = self.keyframes.snapshot()
        ii_arr = np.asarray(ii, dtype=np.int32)
        jj_arr = np.asarray(jj, dtype=np.int32)

        fast = not is_reloc and self.mesh is None
        oneway = fast and bool(self.lcfg.get("oneway_nonconsec", False))
        reuse = (
            fast
            and bool(self.lcfg.get("reuse_tracker_match", False))
            and bool(captures)
        )
        # speculative gating (local_opt.speculative_gate, VERDICT r4 item 2):
        # store every candidate with the gate verdict computed + masked on
        # device, never blocking the backend thread on the match fractions.
        # Requires non-strict (strict needs the verdict NOW for its
        # all-or-nothing decision) and the fast path (reloc stays exact).
        spec = fast and not strict and bool(
            self.lcfg.get("speculative_gate", False)
        )
        if not (oneway or reuse):
            return self._add_factors_symmetric(
                snap, ii_arr, jj_arr, min_match_frac, strict, allow_spec=spec
            )

        consec = ii_arr == (jj_arr - 1)
        cap_mask = (
            np.array([
                bool(c) and (int(a), int(b)) in captures
                for a, b, c in zip(ii_arr, jj_arr, consec)
            ])
            if reuse
            else np.zeros((B,), bool)
        )
        one_mask = (~consec) if oneway else np.zeros((B,), bool)
        sym_mask = ~(cap_mask | one_mask)

        # issue ALL groups' device compute before any host readback:
        # jax dispatch is async, so later groups queue behind device work
        # instead of a tunnel round-trip
        out_s = out_r = out_f = None
        if sym_mask.any():
            out_s = self._compute_symmetric(
                snap, ii_arr[sym_mask], jj_arr[sym_mask]
            )
        if cap_mask.any():
            out_r = self._compute_oneway(
                snap, ii_arr[cap_mask], jj_arr[cap_mask]
            )
        if one_mask.any():
            out_f = self._compute_oneway(
                snap, ii_arr[one_mask], jj_arr[one_mask]
            )
        if out_s is not None and out_f is not None and not spec:
            # one batched host fetch for both gated groups' inputs (two
            # separate np.asarray blocks = two tunnel round-trips; the
            # reuse group is consecutive = kept unconditionally, no fetch)
            fs_j, fs_i, ff_j = jax.device_get((
                out_s["match_frac_j"], out_s["match_frac_i"],
                out_f["match_frac_j"],
            ))
            out_s = dict(out_s, match_frac_j=fs_j, match_frac_i=fs_i)
            out_f = dict(out_f, match_frac_j=ff_j)
        added = False
        if out_s is not None:
            if spec:
                added |= self._gate_store_symmetric_spec(
                    out_s, ii_arr[sym_mask], jj_arr[sym_mask], min_match_frac
                )
            else:
                added |= self._gate_store_symmetric(
                    out_s, ii_arr[sym_mask], jj_arr[sym_mask], min_match_frac,
                    strict=False,
                )
        if out_r is not None:
            added |= self._store_reuse(
                out_r, ii_arr[cap_mask], jj_arr[cap_mask], captures
            )
        if out_f is not None:
            if spec:
                added |= self._gate_store_oneway_spec(
                    out_f, ii_arr[one_mask], jj_arr[one_mask], min_match_frac
                )
            else:
                added |= self._gate_store_oneway(
                    out_f, ii_arr[one_mask], jj_arr[one_mask], min_match_frac
                )
        return added

    def _add_factors_symmetric(self, snap, ii_arr, jj_arr,
                               min_match_frac: float, strict: bool,
                               allow_spec: bool = False) -> bool:
        out = self._compute_symmetric(snap, ii_arr, jj_arr)
        if allow_spec:
            return self._gate_store_symmetric_spec(
                out, ii_arr, jj_arr, min_match_frac
            )
        return self._gate_store_symmetric(
            out, ii_arr, jj_arr, min_match_frac, strict
        )

    def _compute_symmetric(self, snap, ii_arr, jj_arr):
        B = len(ii_arr)
        # paged arrays are indexed by device slot (identity when paging off)
        sii = snap.slot_of[ii_arr]
        sjj = snap.slot_of[jj_arr]
        if self.mesh is not None:
            # shard the symmetric-decode batch over the mesh's edge axis:
            # pad B to a pow2 multiple of the mesh size (pad pairs reuse
            # keyframe 0; their outputs are sliced away below)
            from ..parallel.mesh import shard_edges

            Bpad = _bucket(B, self.mesh.size)
            ii_b = np.concatenate([sii, np.zeros(Bpad - B, np.int32)])
            jj_b = np.concatenate([sjj, np.zeros(Bpad - B, np.int32)])
            feats = shard_edges(
                self.mesh, snap.feat[ii_b], snap.pos[ii_b],
                snap.feat[jj_b], snap.pos[jj_b]
            )
            res = self.model.symmetric(*feats)
        else:
            res = self.model.symmetric(
                snap.feat[sii], snap.pos[sii],
                snap.feat[sjj], snap.pos[sjj]
            )
        return _add_factors_compute(
            self.img_hw,
            res,
            float(self.lcfg["Q_conf"]),
            self._match_kwargs(),
            self._pstride,
        )

    def _gate_store_symmetric(self, out, ii_arr, jj_arr,
                              min_match_frac: float, strict: bool) -> bool:
        B = len(ii_arr)
        # one batched fetch (device_get is a pass-through when add_factors
        # already pre-fetched these as numpy)
        match_frac_j, match_frac_i = jax.device_get(
            (out["match_frac_j"], out["match_frac_i"])
        )
        match_frac_j = np.asarray(match_frac_j)[:B]
        match_frac_i = np.asarray(match_frac_i)[:B]
        consecutive = ii_arr == (jj_arr - 1)
        invalid = np.minimum(match_frac_j, match_frac_i) < min_match_frac
        invalid = (~consecutive) & invalid
        if strict and invalid.any():
            return False
        keep = ~invalid
        n_new = int(keep.sum())
        if n_new == 0:
            return False
        kidx = np.nonzero(keep)[0]
        rows = self._take_edge_rows(n_new)
        self.ii[rows] = ii_arr[kidx]
        self.jj[rows] = jj_arr[kidx]
        kidx_j = jnp.asarray(kidx)
        (self.idx_ii2jj, self.idx_jj2ii, self.valid_match_j,
         self.valid_match_i, self.Q_ii2jj, self.Q_jj2ii) = _store_edges(
            self.idx_ii2jj, self.idx_jj2ii, self.valid_match_j,
            self.valid_match_i, self.Q_ii2jj, self.Q_jj2ii,
            jnp.asarray(rows),
            self._dev(out["idx_i2j"][kidx_j]),
            self._dev(out["idx_j2i"][kidx_j]),
            self._dev(out["valid_j"][kidx_j]),
            self._dev(out["valid_i"][kidx_j]),
            self._dev(out["Qj"][kidx_j]),
            self._dev(out["Qi"][kidx_j]),
        )
        # new edges have no cached gather rows yet
        self._stamp_f[rows] = -1
        self._stamp_b[rows] = -1
        self.edge_live[rows] = True
        return True

    def _compute_oneway(self, snap, ii_arr, jj_arr):
        """Forward-only compute for non-consecutive (loop-closure)
        candidates: one asymmetric decode + one matching per pair (see
        :meth:`add_factors`)."""
        sii = snap.slot_of[ii_arr]
        sjj = snap.slot_of[jj_arr]
        res = self.model.asymmetric(
            snap.feat[sii], snap.pos[sii],
            snap.feat[sjj], snap.pos[sjj],
        )
        return _add_factors_forward(
            self.img_hw, res, float(self.lcfg["Q_conf"]),
            self._match_kwargs(), self._pstride,
        )

    def _store_reuse(self, out, ii_arr, jj_arr, captures) -> bool:
        """Store consecutive edges whose backward direction is the tracker's
        captured match (see :meth:`add_factors`); forward fields come from
        the fresh forward-only compute.  Consecutive edges are kept
        unconditionally (global_opt.py:72-75), so no gate fetch is needed."""
        n_new = len(ii_arr)
        rows = self._take_edge_rows(n_new)
        self.ii[rows] = ii_arr
        self.jj[rows] = jj_arr
        caps = [captures[(int(a), int(b))] for a, b in zip(ii_arr, jj_arr)]
        idx_b = jnp.stack([c[0] for c in caps])
        valid_b = jnp.stack([c[1] for c in caps])
        q_b = jnp.stack([c[2] for c in caps])
        (self.idx_ii2jj, self.idx_jj2ii, self.valid_match_j,
         self.valid_match_i, self.Q_ii2jj, self.Q_jj2ii) = _store_edges(
            self.idx_ii2jj, self.idx_jj2ii, self.valid_match_j,
            self.valid_match_i, self.Q_ii2jj, self.Q_jj2ii,
            jnp.asarray(rows),
            self._dev(out["idx_i2j"]),
            self._dev(idx_b),
            self._dev(out["valid_j"]),
            self._dev(valid_b),
            self._dev(out["Qj"]),
            self._dev(q_b),
        )
        self._stamp_f[rows] = -1
        self._stamp_b[rows] = -1
        self.edge_live[rows] = True
        return True

    def _gate_store_oneway(self, out, ii_arr, jj_arr,
                           min_match_frac: float) -> bool:
        keep = np.asarray(out["match_frac_j"]) >= min_match_frac
        n_new = int(keep.sum())
        if n_new == 0:
            return False
        kidx = np.nonzero(keep)[0]
        rows = self._take_edge_rows(n_new)
        self.ii[rows] = ii_arr[kidx]
        self.jj[rows] = jj_arr[kidx]
        kidx_j = jnp.asarray(kidx)
        (self.idx_ii2jj, self.idx_jj2ii, self.valid_match_j,
         self.valid_match_i, self.Q_ii2jj, self.Q_jj2ii) = _store_edges_oneway(
            self.idx_ii2jj, self.idx_jj2ii, self.valid_match_j,
            self.valid_match_i, self.Q_ii2jj, self.Q_jj2ii,
            jnp.asarray(rows),
            self._dev(out["idx_i2j"][kidx_j]),
            self._dev(out["valid_j"][kidx_j]),
            self._dev(out["Qj"][kidx_j]),
        )
        self._stamp_f[rows] = -1
        self._stamp_b[rows] = -1
        self.edge_live[rows] = True
        return True

    def _gate_store_symmetric_spec(self, out, ii_arr, jj_arr,
                                   min_match_frac: float) -> bool:
        """Speculative symmetric gate+store (local_opt.speculative_gate):
        ALL candidate edges are stored in one dispatch with the
        bidirectional gate verdict computed ON DEVICE and masked into the
        weight fields — a rejected candidate becomes a zero-weight row,
        which the scatter-assembled solve ignores exactly, so the solve
        result is identical to the fetch-then-filter path.  The host never
        blocks; verdicts land lazily via :meth:`resolve_pending_verdicts`.
        Returns True when edges were dispatched (consecutive edges are kept
        unconditionally; a batch of only-rejected candidates leaves dead
        slots — bounded by retrieval.k per task)."""
        B = len(ii_arr)
        if B == 0:
            return False
        rows = self._take_edge_rows(B)
        self.ii[rows] = ii_arr
        self.jj[rows] = jj_arr
        stores, keep = _store_edges_gated(
            self.idx_ii2jj, self.idx_jj2ii, self.valid_match_j,
            self.valid_match_i, self.Q_ii2jj, self.Q_jj2ii,
            jnp.asarray(rows),
            self._dev(out["idx_i2j"]),
            self._dev(out["idx_j2i"]),
            self._dev(out["valid_j"]),
            self._dev(out["valid_i"]),
            self._dev(out["Qj"]),
            self._dev(out["Qi"]),
            self._dev(out["match_frac_j"]),
            self._dev(out["match_frac_i"]),
            self._dev(jnp.asarray(ii_arr == (jj_arr - 1))),
            np.float32(min_match_frac),
        )
        (self.idx_ii2jj, self.idx_jj2ii, self.valid_match_j,
         self.valid_match_i, self.Q_ii2jj, self.Q_jj2ii) = stores
        self._stamp_f[rows] = -1
        self._stamp_b[rows] = -1
        self.edge_live[rows] = True
        self._pending.append((rows, keep))
        return True

    def _gate_store_oneway_spec(self, out, ii_arr, jj_arr,
                                min_match_frac: float) -> bool:
        """Speculative forward-only gate+store (see
        :meth:`_gate_store_symmetric_spec`)."""
        B = len(ii_arr)
        if B == 0:
            return False
        rows = self._take_edge_rows(B)
        self.ii[rows] = ii_arr
        self.jj[rows] = jj_arr
        stores, keep = _store_edges_oneway_gated(
            self.idx_ii2jj, self.idx_jj2ii, self.valid_match_j,
            self.valid_match_i, self.Q_ii2jj, self.Q_jj2ii,
            jnp.asarray(rows),
            self._dev(out["idx_i2j"]),
            self._dev(out["valid_j"]),
            self._dev(out["Qj"]),
            self._dev(out["match_frac_j"]),
            np.float32(min_match_frac),
        )
        (self.idx_ii2jj, self.idx_jj2ii, self.valid_match_j,
         self.valid_match_i, self.Q_ii2jj, self.Q_jj2ii) = stores
        self._stamp_f[rows] = -1
        self._stamp_b[rows] = -1
        self.edge_live[rows] = True
        self._pending.append((rows, keep))
        return True

    def resolve_pending_verdicts(self):
        """Fetch outstanding speculative gate verdicts (one batched host
        read of tiny, long-since-ready buffers) and mark rejected edges
        dead in ``edge_live``.  Dead edges stay as zero-weight device rows
        — the solve ignores them either way — so this is bookkeeping for
        observers: the live-edge count, viz edge lists, checkpoints."""
        if not self._pending:
            return
        keeps = jax.device_get([k for _, k in self._pending])
        for (rows, _), kv in zip(self._pending, keeps):
            self.edge_live[rows] = np.asarray(kv, dtype=bool)
        self._pending.clear()

    @property
    def n_live_edges(self) -> int:
        """Edges that passed (or never needed) the match-fraction gate and
        were not recycled.  Equals ``n_edges`` unless speculative gating
        left dead slots or old edges were recycled."""
        self.resolve_pending_verdicts()
        return int(self.edge_live[: self.n_edges].sum())

    def _take_edge_rows(self, B: int) -> np.ndarray:
        """Allocate B edge rows: recycled rows first (edge-memory bound for
        long videos), then fresh rows off the end (growing pow2)."""
        rows = self._free_edge_rows[:B]
        del self._free_edge_rows[:B]
        need = B - len(rows)
        if need:
            self._ensure_capacity(self.n_edges + need)
            rows.extend(range(self.n_edges, self.n_edges + need))
            self.n_edges += need
        return np.asarray(rows, np.int32)

    def _recycle_old_edges(self, s0: int):
        """Retire edges with BOTH endpoints before the solve window
        (VERDICT r4 item 3: the edge arrays are the dominant device memory
        at long-video scale — ~3.5 MB/edge at production resolution).

        A windowed solve never touches old-old edges (its kept-mask needs
        an endpoint >= s0), and the window only moves forward, so retiring
        them is solve-identical for every future solve.  Rows are zeroed on
        device (exact no-ops if a full solve ever sees them) and queued for
        reuse; the arrays stop growing once the per-window edge population
        stabilises."""
        self.resolve_pending_verdicts()
        E = self.n_edges
        if E == 0:
            return
        free_mask = np.zeros((E,), bool)
        free_mask[[r for r in self._free_edge_rows if r < E]] = True
        old = (
            (self.ii[:E] < s0) & (self.jj[:E] < s0) & ~free_mask
        )
        rows = np.nonzero(old)[0].astype(np.int32)
        if rows.size == 0:
            return
        # pad to a pow2 bucket (repeat the first row — same-value writes)
        Rpad = _bucket(int(rows.size), 4)
        rows_p = np.full((Rpad,), rows[0], np.int32)
        rows_p[: rows.size] = rows
        (self.valid_match_j, self.valid_match_i,
         self.Q_ii2jj, self.Q_jj2ii) = _zero_edge_rows(
            self.valid_match_j, self.valid_match_i,
            self.Q_ii2jj, self.Q_jj2ii, jnp.asarray(rows_p),
        )
        self.ii[rows] = 0
        self.jj[rows] = 0
        self.edge_live[rows] = False
        self._stamp_f[rows] = -1
        self._stamp_b[rows] = -1
        self._free_edge_rows.extend(int(r) for r in rows)
        self._free_edge_rows.sort()
        self.n_edges_recycled += int(rows.size)

    def _ensure_capacity(self, needed: int):
        """Double the edge SoA when full (long-video ingest can outgrow the
        initial allocation; growth is pow2 so solve-bucket recompiles stay
        rare)."""
        if needed <= self.capacity:
            return
        new_cap = self.capacity
        while new_cap < needed:
            new_cap *= 2
        N = self.N
        pad = new_cap - self.capacity

        def grow(a, fill=0):
            pad_widths = ((0, pad),) + ((0, 0),) * (a.ndim - 1)
            return jnp.pad(a, pad_widths, constant_values=fill)

        self.idx_ii2jj = grow(self.idx_ii2jj)
        self.idx_jj2ii = grow(self.idx_jj2ii)
        self.valid_match_j = grow(self.valid_match_j)
        self.valid_match_i = grow(self.valid_match_i)
        self.Q_ii2jj = grow(self.Q_ii2jj)
        self.Q_jj2ii = grow(self.Q_jj2ii)
        self.ii = np.concatenate([self.ii, np.zeros(pad, np.int32)])
        self.jj = np.concatenate([self.jj, np.zeros(pad, np.int32)])
        self._stamp_f = np.concatenate(
            [self._stamp_f, np.full(pad, -1, np.int64)]
        )
        self._stamp_b = np.concatenate(
            [self._stamp_b, np.full(pad, -1, np.int64)]
        )
        self.edge_live = np.concatenate(
            [self.edge_live, np.ones(pad, bool)]
        )
        self.capacity = new_cap

    def _match_kwargs(self):
        m = self.cfg["matching"]
        return MatchKwargs(
            max_iter=m["max_iter"],
            lambda_init=m["lambda_init"],
            convergence_thresh=m["convergence_thresh"],
            dist_thresh=m["dist_thresh"],
            radius=m["radius"],
            dilation_max=m["dilation_max"],
            refine_gate=m.get("refine_gate", "none"),
            refine_budget_frac=m.get("refine_budget_frac", 0.125),
            refine_subset_dilations=(
                tuple(m["refine_subset_dilations"])
                if m.get("refine_subset_dilations") else None
            ),
            refine_final_radius=m.get("refine_final_radius"),
            proj_gate=m.get("proj_gate", "none"),
            proj_init=m.get("proj_init", "warm"),
            proj_pre_iters=m.get("proj_pre_iters", 2),
            proj_budget_frac=m.get("proj_budget_frac", 0.125),
        )

    # ------------------------------------------------------------------
    # solve
    # ------------------------------------------------------------------

    def solve(self, mode: str = None):
        """Two-way edge expansion + global GN + pose write-back
        (global_opt.py:104-213).

        Concurrency: runs on a keyframe-store SNAPSHOT, entirely lock-free;
        the solved poses are installed by ``write_back_poses`` under a brief
        lock with a generation check (a reloc pop invalidates the write-back,
        appends since the snapshot keep their tracked poses — the staleness
        the reference tolerates across its process boundary, main.py:225).
        """
        if mode is None:
            mode = "calib" if self.cfg["use_calib"] else "rays"
        E = self.n_edges
        # keyframe paging: re-materialise what this solve needs BEFORE the
        # snapshot (the snapshot's slot table is immutable afterwards)
        self._prepare_residency(mode)
        # pointmap versions BEFORE the snapshot: a concurrent fusion landing
        # in between then stamps the cache conservatively (re-gathered next
        # solve) — never the unsafe direction (stale data, fresh stamp)
        ver = self.keyframes.pm_version.copy()
        snap = self.keyframes.snapshot()
        n_kf = snap.n
        if E == 0 or n_kf <= self.settings.pin:
            return
        # solver health guard (VERDICT r4 item 6): the GN loop's monotone-
        # cost check already REVERTED any diverging step on device (poses
        # stayed at the last good iterate); here the previous PCG-routed
        # solve's flag — a long-since-ready 1-byte buffer, so the fetch
        # overlaps this task's queued device work — demotes THIS solve to
        # the windowed-dense route, converting "trusted because probed"
        # into safe-by-construction (ops/global_gn.py preconditioner note).
        if self._consume_health():
            old = self.settings
            self.settings = old._replace(solver="dense")
            try:
                window = min(self.window_size or 10 ** 9,
                             old.dense_max_poses)
                if (n_kf - old.pin) > window:
                    self._solve_windowed(mode, snap, E, n_kf, window, ver)
                else:
                    self._solve_full(mode, snap, E, n_kf, ver)
            finally:
                self.settings = old
            return
        # windowing: bound the number of free poses (see __init__) when
        # local_opt.window_size is set.  (The r3-era clamp that kept
        # `solver: auto` off the PCG route is gone: the on-chip PCG GN
        # divergence was root-caused to the f32 Sim(3) exp retraction and
        # fixed in r4 — see lie/sim3.exp and GlobalGNSettings.)
        window = self._effective_window()
        if window and (n_kf - self.settings.pin) > window:
            self._solve_windowed(mode, snap, E, n_kf, window, ver)
            return
        self._solve_full(mode, snap, E, n_kf, ver)

    def _effective_window(self) -> int:
        """Solve window, clamped to the keyframe-paging residency guarantee:
        with `engine.device_keyframes` set, only the `keep_recent` newest
        keyframes are guaranteed resident, so a solve may free at most that
        many poses (the paging memory plan IMPLIES windowing — the windowed
        route re-materialises evicted pinned-context keyframes on demand,
        the full route cannot)."""
        window = self.window_size
        if self.keyframes.paging:
            window = min(window or 10 ** 9, self.keyframes.keep_recent)
        return window

    def _prepare_residency(self, mode: str):
        """Before snapshotting for a solve under paging: re-materialise
        every keyframe the solve will touch (window + pinned context
        endpoints of surviving edges) and mark the old context sticky so
        repeated solves don't thrash upload/evict."""
        kf = self.keyframes
        if not kf.paging:
            return
        n_now = len(kf)
        window = self._effective_window()
        E = self.n_edges
        if not (window and (n_now - self.settings.pin) > window) or E == 0:
            return
        s0 = n_now - window
        ii_e = self.ii[:E]
        jj_e = self.jj[:E]
        keep = (ii_e >= s0) | (jj_e >= s0)
        refs = np.unique(np.concatenate([ii_e[keep], jj_e[keep]]))
        kf.sticky = {int(r) for r in refs if r < s0}
        kf.ensure_resident(
            list(int(r) for r in refs) + list(range(s0, n_now))
        )

    def _solve_full(self, mode: str, snap, E: int, n_kf: int, ver):
        # bucket floors trade a little padded compute early in a session for
        # far fewer (Epad, Ppad) jit signatures — each distinct pair is a
        # separate solve compile (20-40 s on the remote TPU compile service,
        # minutes when it degrades); padded edges carry valid=False and
        # contribute nothing.  Mesh mode floors Epad at the mesh size too.
        e_floor = int(self.lcfg.get("edge_bucket_floor", 16))
        p_floor = int(self.lcfg.get("pose_bucket_floor", 16))
        if self.mesh is not None:
            e_floor = max(e_floor, self.mesh.size)
        half = _bucket(E, max(e_floor // 2, 1))
        self._ensure_capacity(half)  # _expand_two_way slices stores[:half]
        Epad = 2 * half
        Ppad = _bucket(n_kf, p_floor)
        Ppad = min(Ppad, _bucket(self.keyframes.capacity, 2))  # cap at store

        # two-way layout [forward(0..half) | backward(0..half)] matching
        # _expand_two_way; rows >= E carry valid=False (host-side build of
        # the small index vectors costs no device dispatch)
        ii2 = np.zeros((Epad,), dtype=np.int32)
        jj2 = np.zeros((Epad,), dtype=np.int32)
        ii2[:E] = self.ii[:E]
        jj2[:E] = self.jj[:E]
        ii2[half : half + E] = self.jj[:E]
        jj2[half : half + E] = self.ii[:E]

        if self.keyframes.paging:
            # the full-graph path indexes the paged pointmap arrays by POSE
            # index — only valid on the identity prefix.  Paging sizes
            # (keep_recent < device budget) route past-identity sessions to
            # the windowed solve, so this is a config invariant, not a
            # runtime branch.
            sl = snap.slot_of[:n_kf]
            assert np.array_equal(sl, np.arange(n_kf, dtype=sl.dtype)), (
                "full-graph solve with non-identity keyframe paging; set "
                "local_opt.window_size <= engine keep_recent (see "
                "_effective_window)"
            )

        idx, valid, Q = _expand_two_way(
            self.idx_ii2jj, self.idx_jj2ii, self.valid_match_j,
            self.valid_match_i, self.Q_ii2jj, self.Q_jj2ii, E, half,
        )

        if self._cache_usable(half):
            self._refresh_gcache(E, half, ver, snap, mode)
            Twc_new, iters, ok, diverged = gauss_newton_poses_cached(
                snap.T_WC[:Ppad],
                snap.X[:Ppad],
                snap.C[:Ppad],
                snap.n_fused[:Ppad],
                jnp.asarray(ii2),
                jnp.asarray(jj2),
                self._gf[:half],
                self._gb[:half],
                idx,
                valid,
                Q,
                self.K,
                self.img_hw,
                self.settings,
                mode,
            )
        else:
            Twc = snap.T_WC[:Ppad]
            Xs = snap.X[:Ppad]
            Cs = snap.C[:Ppad] / jnp.maximum(
                snap.n_fused[:Ppad, None, None].astype(jnp.float32), 1.0
            )
            Twc_new, iters, ok, diverged = self._dispatch_solve(
                Twc, Xs, Cs, ii2, jj2, idx, valid, Q, self.settings, mode
            )
        self._record_health(diverged, Ppad)
        # write back optimized poses for all real keyframes except pinned
        # (brief lock + generation check inside; a diverged solve's poses
        # are the last GOOD iterate — the guard reverted the bad step)
        self.keyframes.write_back_poses(
            self.settings.pin, n_kf, snap.generation, Twc_new
        )

    # ------------------------------------------------------------------
    # solver health guard (VERDICT r4 item 6)
    # ------------------------------------------------------------------

    def _record_health(self, diverged, Ppad: int, pin: int = None):
        """Keep the GN loop's `diverged` flag for the next solve to check —
        but only when this solve ROUTED TO PCG (the dense Cholesky path is
        damping-guaranteed PD and isfinite-checked; recording it too would
        cost every small session a per-task fetch for nothing).  Mirrors
        the static routing predicate in ops.global_gn._gn_core (P is the
        padded pose count there as well)."""
        pin = self.settings.pin if pin is None else pin
        routed_pcg = self.settings.solver == "pcg" or (
            self.settings.solver == "auto"
            and (Ppad - pin) > self.settings.dense_max_poses
        )
        if routed_pcg:
            self._health_pending = diverged

    def _consume_health(self) -> bool:
        """True iff the PREVIOUS PCG-routed solve diverged (its bad step was
        already reverted on device).  The flag buffer has been ready since
        that solve finished, so this fetch overlaps the current task's
        queued device work instead of stalling on compute."""
        if self._health_pending is None:
            return False
        div = bool(np.asarray(self._health_pending))
        self._health_pending = None
        if div:
            self.n_recoveries += 1
            import sys as _sys

            print(
                "global GN: monotone-cost guard tripped on the PCG route; "
                "demoting this solve to windowed-dense",
                file=_sys.stderr,
            )
        return div

    # ------------------------------------------------------------------
    # gathered-point cache
    # ------------------------------------------------------------------

    def _cache_usable(self, half: int) -> bool:
        """Cache applies to single-device solves (full-graph AND windowed —
        the cached rows are window-independent; the mesh path shards raw
        edge fields) and is bounded by gather_cache_max_edges."""
        return (
            self._gcache_on and self.mesh is None and half <= self._gcache_max
        )

    def _ensure_gcache(self, half: int):
        if self._gcache_cap >= half and self._gf is not None:
            return
        cap = max(self._gcache_cap, 1)
        while cap < half:
            cap *= 2
        N = self.N
        # unwritten rows hold FINITE dummy points: zero-weight edges still
        # flow through norm/divide in the residual models (a zero row would
        # make 0 * NaN poison the whole reduction — same rule as the Pallas
        # pixel padding in gauss_newton_poses)
        if self._gf is None:
            self._gf = self._dev(jnp.ones((cap, N, 4), jnp.float32))
            self._gb = self._dev(jnp.ones((cap, N, 4), jnp.float32))
        else:
            pad = cap - self._gcache_cap
            self._gf = jnp.pad(
                self._gf, ((0, pad), (0, 0), (0, 0)), constant_values=1.0
            )
            self._gb = jnp.pad(
                self._gb, ((0, pad), (0, 0), (0, 0)), constant_values=1.0
            )
        self._gcache_cap = cap

    def _refresh_gcache(self, E: int, half: int, ver, snap, mode: str,
                        among=None):
        """Re-gather rows of edges whose source keyframes changed.

        `among`: optional boolean mask over edges 0..E — restrict the
        refresh to that subset (the windowed solve only needs its kept
        edges fresh; dropped old-old edges stay stale until reused)."""
        self._ensure_gcache(half)
        ii_e = self.ii[:E]
        jj_e = self.jj[:E]
        stale = (self._stamp_f[:E] != ver[ii_e]) | (
            self._stamp_b[:E] != ver[jj_e]
        )
        if among is not None:
            stale = stale & among
        sidx = np.nonzero(stale)[0].astype(np.int32)
        if sidx.size == 0:
            return
        Spad = _bucket(int(sidx.size), 4)
        pos = np.full((Spad,), sidx[0], np.int32)
        pos[: sidx.size] = sidx
        pos_j = jnp.asarray(pos)
        self._gf, self._gb = _refresh_gather(
            self._gf,
            self._gb,
            snap.X,
            snap.C,
            self.K,
            jnp.asarray(snap.slot_of[ii_e[pos]]),
            jnp.asarray(snap.slot_of[jj_e[pos]]),
            self.idx_ii2jj[pos_j],
            self.idx_jj2ii[pos_j],
            pos_j,
            self.img_hw,
            mode,
        )
        self._stamp_f[sidx] = ver[ii_e[sidx]]
        self._stamp_b[sidx] = ver[jj_e[sidx]]

    def _dispatch_solve(self, Twc, Xs, Cs, ii2, jj2, idx, valid, Q,
                        settings, mode: str):
        """Run the (mesh-sharded or single-device) global GN on prepared
        pose/edge arrays."""
        if mode == "calib":
            from ..geometry import constrain_points_to_ray

            Xs = jax.vmap(
                lambda X: constrain_points_to_ray(self.img_hw, X, self.K)
            )(Xs)

        if self.mesh is not None:
            from ..parallel.mesh import replicate, shard_edges
            from ..parallel.sharded_ba import gauss_newton_poses_sharded

            Twc_r, Xs_r, Cs_r = replicate(self.mesh, Twc, Xs, Cs)
            ii_d, jj_d, idx_d, valid_d, Q_d = shard_edges(
                self.mesh, jnp.asarray(ii2), jnp.asarray(jj2), idx, valid, Q
            )
            return gauss_newton_poses_sharded(
                self.mesh, Twc_r, Xs_r, Cs_r, ii_d, jj_d, idx_d, valid_d, Q_d,
                self.K, self.img_hw, settings, mode,
            )
        return gauss_newton_poses(
            Twc, Xs, Cs,
            jnp.asarray(ii2), jnp.asarray(jj2), idx, valid, Q,
            self.K, self.img_hw, settings, mode,
        )

    def _solve_windowed(self, mode: str, snap, E: int, n_kf: int,
                        window: int, ver):
        """Windowed solve: optimise only the last `window` keyframes.

        Poses older than the window are FIXED; edges with at least one
        endpoint in the window are kept and their old endpoints enter the
        compact pose array as pinned context (functionally the reference's
        f64 full solve restricted to the recent past — the f32-on-chip
        accuracy story for >1024-pose chains is recorded in BASELINE.md r3).

        Static-shape discipline: the compact array is
        [pinned refs (pow2 pad) | window poses (pow2 pad)], kept edges are
        padded to a pow2 bucket, and dropped/padded edges map both endpoints
        to compact slot 0 — a pinned self-loop whose four scatter blocks
        cancel exactly, so it contributes nothing.
        """
        s0 = n_kf - window  # first free pose (s0 >= pin >= 1 by caller)
        ii_e = self.ii[:E]
        jj_e = self.jj[:E]
        keep = (ii_e >= s0) | (jj_e >= s0)
        kept = np.nonzero(keep)[0].astype(np.int32)
        if kept.size == 0:
            return
        old_ref = np.unique(
            np.concatenate(
                [ii_e[keep][ii_e[keep] < s0], jj_e[keep][jj_e[keep] < s0]]
            )
        ).astype(np.int32)
        if old_ref.size == 0:
            # window subgraph disconnected from the past: anchor the gauge
            # on the newest pre-window pose
            old_ref = np.array([s0 - 1], np.int32)

        pinpad = _bucket(int(old_ref.size), 8)
        p_floor = int(self.lcfg.get("pose_bucket_floor", 16))
        Ppad = _bucket(pinpad + window, p_floor)
        sel = np.concatenate(
            [
                old_ref,
                np.full(pinpad - old_ref.size, old_ref[0], np.int32),
                np.arange(s0, n_kf, dtype=np.int32),
                np.full(Ppad - pinpad - window, old_ref[0], np.int32),
            ]
        )
        remap = np.zeros((n_kf,), np.int32)  # unreferenced old poses -> 0
        remap[old_ref] = np.arange(old_ref.size, dtype=np.int32)
        remap[s0:n_kf] = pinpad + np.arange(window, dtype=np.int32)

        e_floor = int(self.lcfg.get("edge_bucket_floor", 16))
        if self.mesh is not None:
            e_floor = max(e_floor, self.mesh.size)
        half = _bucket(int(kept.size), max(e_floor // 2, 1))
        Epad = 2 * half
        mii = remap[ii_e[kept]]
        mjj = remap[jj_e[kept]]
        ii2 = np.zeros((Epad,), np.int32)
        jj2 = np.zeros((Epad,), np.int32)
        K_ = kept.size
        ii2[:K_] = mii
        jj2[:K_] = mjj
        ii2[half : half + K_] = mjj
        jj2[half : half + K_] = mii

        kidx = np.zeros((half,), np.int32)
        kidx[:K_] = kept
        kmask = np.zeros((half,), bool)
        kmask[:K_] = True
        idx, valid, Q = _expand_two_way_subset(
            self.idx_ii2jj, self.idx_jj2ii, self.valid_match_j,
            self.valid_match_i, self.Q_ii2jj, self.Q_jj2ii,
            jnp.asarray(kidx), jnp.asarray(kmask),
        )

        # paged arrays are indexed by device slot; _prepare_residency
        # uploaded every selected keyframe before solve() snapshotted
        sel_slots = snap.slot_of[sel]
        assert (sel_slots >= 0).all(), "windowed solve selected an evicted keyframe"
        sel_j = jnp.asarray(sel_slots)
        pose_sel = jnp.asarray(sel)  # pose-side state stays logically indexed
        settings = self.settings._replace(pin=pinpad)
        cache_cap = _bucket(E, 4)
        if self._cache_usable(cache_cap):
            # cached rows are window-independent (per-edge gathers of the
            # ORIGINAL keyframes); only the pose-index remap differs.
            # Refresh just the kept edges, then slice their rows compactly.
            # (`ver` was read BEFORE the snapshot by solve() — conservative.)
            among = np.zeros((E,), bool)
            among[kept] = True
            self._refresh_gcache(E, cache_cap, ver, snap, mode, among=among)
            kidx_j = jnp.asarray(kidx)
            Twc_new, iters, ok, diverged = gauss_newton_poses_cached(
                snap.T_WC[pose_sel],
                snap.X[sel_j],
                snap.C[sel_j],
                snap.n_fused[pose_sel],
                jnp.asarray(ii2),
                jnp.asarray(jj2),
                self._gf[kidx_j],
                self._gb[kidx_j],
                idx,
                valid,
                Q,
                self.K,
                self.img_hw,
                settings,
                mode,
            )
        else:
            Twc = snap.T_WC[pose_sel]
            Xs = snap.X[sel_j]
            Cs = snap.C[sel_j] / jnp.maximum(
                snap.n_fused[pose_sel][:, None, None].astype(jnp.float32), 1.0
            )
            Twc_new, iters, ok, diverged = self._dispatch_solve(
                Twc, Xs, Cs, ii2, jj2, idx, valid, Q, settings, mode
            )
        self._record_health(diverged, Ppad, pin=pinpad)
        self.keyframes.write_back_poses(
            s0, n_kf, snap.generation, Twc_new, src_offset=pinpad
        )
        # long-video memory bound: retire old-old edges once the window has
        # moved past them (paging engines always; optable via edge_recycle)
        if self.keyframes.paging or bool(self.lcfg.get("edge_recycle", False)):
            self._recycle_old_edges(s0)


class MatchKwargs(dict):
    """Hashable bag of matcher params (static under jit).

    Like TrackerSettings, every value here is compile-time constant: a new
    combination of matcher knobs compiles a new `_add_factors_compute`.
    Keep settings fixed within a session (see TrackerSettings docstring).
    """

    def __init__(self, **kw):
        super().__init__(**kw)
        self._key = tuple(sorted(kw.items()))

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, MatchKwargs) and self._key == other._key


@partial(jax.jit, static_argnames=("img_hw", "mk", "stride"))
def _add_factors_compute(img_hw, res, Q_conf, mk: MatchKwargs,
                         stride: int = 1):
    """Two-way matching + Q aggregation for B edges — ONE dispatch.

    Mirrors mast3r_match_symmetric (mast3r_utils.py:142-180) + the Q
    aggregation in global_opt.py:55-66.  The matcher is UNROLLED per edge
    pair inside the program rather than run at batch 2B: batched matching
    lowers ~2x worse per image on TPU (19.5 ms/matching at 2B=2 vs
    34-35 ms at 2B=4..8 — scripts/microbench_backend_match.py, r4; the
    window-table gathers degrade past batch 2), so B sequential pair
    matchers are both faster on-device and still a single dispatch.
    """
    B = res[0][0].shape[0]
    if B > 1:
        def pair(b):
            sl = tuple(
                tuple(x[b : b + 1] for x in quad) for quad in res
            )
            return _add_factors_pair(img_hw, sl, Q_conf, mk, stride)

        outs = [pair(b) for b in range(B)]
        return {
            k: jnp.concatenate([o[k] for o in outs]) for k in outs[0]
        }
    return _add_factors_pair(img_hw, res, Q_conf, mk, stride)


@partial(jax.jit, static_argnames=("img_hw", "mk", "stride"))
def _add_factors_forward(img_hw, res, Q_conf, mk: MatchKwargs,
                         stride: int = 1):
    """Forward-only (i -> j) matching + Q aggregation for B candidate pairs
    in ONE dispatch (the `local_opt.oneway_nonconsec` path).

    Exactly the forward half of `_add_factors_compute`: same matcher, same
    Qj = sqrt(Qii[idx] * Qji) aggregation (global_opt.py:55-57), same
    unrolled-per-pair schedule (batched matching degrades past batch 2 —
    scripts/microbench_backend_match.py)."""
    B = res[0][0].shape[0]
    if B > 1:
        def pair(b):
            sl = tuple(
                tuple(x[b : b + 1] for x in quad) for quad in res
            )
            return _forward_pair(img_hw, sl, Q_conf, mk, stride)

        outs = [pair(b) for b in range(B)]
        return {
            k: jnp.concatenate([o[k] for o in outs]) for k in outs[0]
        }
    return _forward_pair(img_hw, res, Q_conf, mk, stride)


def _strided_rows(img_hw, stride):
    """Linear indices (in the FULL grid) of the s-strided source pixels —
    both the matcher's warm-start init and the scatter positions of the
    backend pixel budget (local_opt.pixel_stride)."""
    H, W = img_hw
    r = (
        (jnp.arange(0, H, stride, dtype=jnp.int32) * W)[:, None]
        + jnp.arange(0, W, stride, dtype=jnp.int32)[None, :]
    )
    return r.reshape(-1)


def _scatter_rows(rows, N, idx_s, valid_s, Q_s):
    """Strided matcher outputs -> full-shape edge fields (off-grid rows
    carry valid False / Q 0 — exact zero-weight in the solve)."""
    B = idx_s.shape[0]
    idx = jnp.zeros((B, N), jnp.int32).at[:, rows].set(idx_s)
    valid = jnp.zeros((B, N, 1), bool).at[:, rows].set(valid_s)
    Q = jnp.zeros((B, N, 1), jnp.float32).at[:, rows].set(
        jnp.asarray(Q_s, jnp.float32))
    return idx, valid, Q


def _forward_pair(img_hw, res, Q_conf, mk: MatchKwargs, stride: int = 1):
    H, W = img_hw
    N = H * W
    res_ii, res_ji = res
    Xii, _, Dii, Qii = res_ii
    Xji, _, Dji, Qji = res_ji
    B = Xii.shape[0]

    if stride > 1:
        rows = _strided_rows(img_hw, stride)
        init = jnp.broadcast_to(rows, (B, rows.shape[0]))
        idx_s, valid_s = matching.match(
            Xii, Xji[:, ::stride, ::stride], Dii, Dji[:, ::stride, ::stride],
            idx_1_to_2_init=init, **mk,
        )
        Qii_f = Qii.reshape(B, N, 1)
        Qji_s = Qji[:, ::stride, ::stride].reshape(B, -1, 1)
        Qj_s = jnp.sqrt(
            jnp.take_along_axis(Qii_f, idx_s[..., None], axis=1) * Qji_s
        )
        vj_s = valid_s & (Qj_s > Q_conf)
        match_frac_j = jnp.mean(vj_s.astype(jnp.float32), axis=(1, 2))
        idx_i2j, valid_j, Qj = _scatter_rows(rows, N, idx_s, valid_s, Qj_s)
        return dict(
            idx_i2j=idx_i2j,
            valid_j=valid_j,
            Qj=Qj,
            match_frac_j=match_frac_j,
        )

    idx_i2j, valid_j = matching.match(Xii, Xji, Dii, Dji, **mk)

    Qii_f = Qii.reshape(B, N, 1)
    Qji_f = Qji.reshape(B, N, 1)
    Qj = jnp.sqrt(jnp.take_along_axis(Qii_f, idx_i2j[..., None], axis=1) * Qji_f)
    vj = valid_j & (Qj > Q_conf)
    match_frac_j = jnp.mean(vj.astype(jnp.float32), axis=(1, 2))
    return dict(
        idx_i2j=idx_i2j,
        valid_j=valid_j,
        Qj=Qj,
        match_frac_j=match_frac_j,
    )


def _add_factors_pair(img_hw, res, Q_conf, mk: MatchKwargs, stride: int = 1):
    H, W = img_hw
    N = H * W
    res_ii, res_ji, res_jj, res_ij = res
    Xii, _, Dii, Qii = res_ii
    Xji, _, Dji, Qji = res_ji
    Xjj, _, Djj, Qjj = res_jj
    Xij, _, Dij, Qij = res_ij

    B = Xii.shape[0]
    X11 = jnp.concatenate([Xii, Xjj], axis=0)
    D11 = jnp.concatenate([Dii, Djj], axis=0)

    if stride > 1:
        # backend pixel budget: s-strided source rows for BOTH directions,
        # scattered back into full-shape fields (see _forward_pair)
        rows = _strided_rows(img_hw, stride)
        init = jnp.broadcast_to(rows, (2 * B, rows.shape[0]))
        X21 = jnp.concatenate(
            [Xji[:, ::stride, ::stride], Xij[:, ::stride, ::stride]], axis=0
        )
        D21 = jnp.concatenate(
            [Dji[:, ::stride, ::stride], Dij[:, ::stride, ::stride]], axis=0
        )
        idx_s, valid_s = matching.match(
            X11, X21, D11, D21, idx_1_to_2_init=init, **mk
        )
        Qii_f = Qii.reshape(B, N, 1)
        Qjj_f = Qjj.reshape(B, N, 1)
        Qji_s = Qji[:, ::stride, ::stride].reshape(B, -1, 1)
        Qij_s = Qij[:, ::stride, ::stride].reshape(B, -1, 1)
        Qj_s = jnp.sqrt(
            jnp.take_along_axis(Qii_f, idx_s[:B][..., None], axis=1) * Qji_s
        )
        Qi_s = jnp.sqrt(
            jnp.take_along_axis(Qjj_f, idx_s[B:][..., None], axis=1) * Qij_s
        )
        vj_s = valid_s[:B] & (Qj_s > Q_conf)
        vi_s = valid_s[B:] & (Qi_s > Q_conf)
        match_frac_j = jnp.mean(vj_s.astype(jnp.float32), axis=(1, 2))
        match_frac_i = jnp.mean(vi_s.astype(jnp.float32), axis=(1, 2))
        idx_i2j, valid_j, Qj = _scatter_rows(
            rows, N, idx_s[:B], valid_s[:B], Qj_s
        )
        idx_j2i, valid_i, Qi = _scatter_rows(
            rows, N, idx_s[B:], valid_s[B:], Qi_s
        )
        return dict(
            idx_i2j=idx_i2j, idx_j2i=idx_j2i,
            valid_j=valid_j, valid_i=valid_i,
            Qj=Qj, Qi=Qi,
            match_frac_j=match_frac_j, match_frac_i=match_frac_i,
        )

    X21 = jnp.concatenate([Xji, Xij], axis=0)
    D21 = jnp.concatenate([Dji, Dij], axis=0)

    idx_1_to_2, valid = matching.match(X11, X21, D11, D21, **mk)
    idx_i2j = idx_1_to_2[:B]
    idx_j2i = idx_1_to_2[B:]
    valid_j = valid[:B]
    valid_i = valid[B:]

    Qii_f = Qii.reshape(B, N, 1)
    Qjj_f = Qjj.reshape(B, N, 1)
    Qji_f = Qji.reshape(B, N, 1)
    Qij_f = Qij.reshape(B, N, 1)

    Qj = jnp.sqrt(jnp.take_along_axis(Qii_f, idx_i2j[..., None], axis=1) * Qji_f)
    Qi = jnp.sqrt(jnp.take_along_axis(Qjj_f, idx_j2i[..., None], axis=1) * Qij_f)

    valid_Qj = Qj > Q_conf
    valid_Qi = Qi > Q_conf
    vj = valid_j & valid_Qj
    vi = valid_i & valid_Qi
    match_frac_j = jnp.mean(vj.astype(jnp.float32), axis=(1, 2))
    match_frac_i = jnp.mean(vi.astype(jnp.float32), axis=(1, 2))

    return dict(
        idx_i2j=idx_i2j,
        idx_j2i=idx_j2i,
        valid_j=valid_j,
        valid_i=valid_i,
        Qj=Qj,
        Qi=Qi,
        match_frac_j=match_frac_j,
        match_frac_i=match_frac_i,
    )
