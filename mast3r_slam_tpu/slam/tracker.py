"""Frame-to-keyframe tracker.

Capability mirror of /root/reference/mast3r_slam/tracker.py with a TPU
execution shape: two-view inference runs through the model interface, then
the rest of the per-frame hot path — dense projective matching, confidence
gating, the Sim(3) GN pose solve and both pointmap fusions — is ONE jitted
device program (``_track_compute``); the host reads back a handful of
scalars to make the keyframe/relocalisation decision.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry import constrain_points_to_ray, get_pixel_coords
from ..lie import sim3
from ..ops import matching
from ..ops.tracking_gn import (
    GNSettings,
    opt_pose_calib_sim3,
    opt_pose_ray_dist_sim3,
)
from .frame import Frame, Keyframes, fuse_pointmap


class TrackerSettings(NamedTuple):
    """Static jit argument: EVERY field (floats included) is baked into the
    compiled `_track_compute`, so changing any value — not just the
    shape-affecting ones — triggers a full recompile (~20-40s on the TPU
    tunnel).  This is deliberate: thresholds live in registers/constants and
    the gating compaction sizes specialize.  Treat tracker settings as fixed
    for the life of a session; a serving process that wants to sweep a
    threshold should expect one recompile per distinct setting tuple.
    """

    # matching (config/base.yaml `matching:`)
    max_iter: int = 10
    lambda_init: float = 1e-8
    convergence_thresh: float = 1e-6
    dist_thresh: float = 0.1
    radius: int = 3
    dilation_max: int = 5
    refine_gate: str = "none"
    refine_budget_frac: float = 0.125
    refine_subset_dilations: tuple = None  # None = dilation_max..2
    refine_final_radius: int = None        # None = radius
    proj_gate: str = "none"
    proj_init: str = "warm"
    proj_pre_iters: int = 2
    proj_budget_frac: float = 0.125
    # tracking (config/base.yaml `tracking:`)
    min_match_frac: float = 0.05
    C_conf: float = 0.0
    Q_conf: float = 1.5
    match_frac_thresh: float = 0.333
    filtering_mode: str = "weighted_pointmap"
    filtering_score: str = "median"
    use_calib: bool = False
    gn: GNSettings = GNSettings()

    @classmethod
    def from_config(cls, cfg) -> "TrackerSettings":
        m, t = cfg["matching"], cfg["tracking"]
        return cls(
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
            min_match_frac=t["min_match_frac"],
            C_conf=t["C_conf"],
            Q_conf=t["Q_conf"],
            match_frac_thresh=t["match_frac_thresh"],
            filtering_mode=t["filtering_mode"],
            filtering_score=t["filtering_score"],
            use_calib=cfg["use_calib"],
            gn=GNSettings(
                max_iters=t["max_iters"],
                rel_error=t["rel_error"],
                delta_norm=t["delta_norm"],
                huber_k=t["huber"],
                sigma_ray=t["sigma_ray"],
                sigma_dist=t["sigma_dist"],
                sigma_pixel=t["sigma_pixel"],
                sigma_depth=t["sigma_depth"],
                pixel_border=t["pixel_border"],
                depth_eps=t["depth_eps"],
            ),
        )


@partial(jax.jit, static_argnames=("ts", "img_hw"))
def _track_compute(
    ts: TrackerSettings,
    img_hw: Tuple[int, int],
    Xii, Cii, Dii, Qii,      # frame canonical prediction (1, H, W, *)
    Xji, Cji, Dji, Qji,      # keyframe-in-frame prediction (1, H, W, *)
    frame_X, frame_C, frame_n_fused, frame_n_updates, frame_score,
    kf_X, kf_C, kf_n_fused, kf_n_updates, kf_score,
    T_WCf, T_WCk,
    idx_init,
    K,
):
    """Everything after inference for one tracked frame (tracker.py:28-127)."""
    H, W = img_hw
    N = H * W

    # 1. dense matching: keyframe pixels -> frame pixels
    idx_f2k, valid_match = matching.match(
        Xii,
        Xji,
        Dii,
        Dji,
        idx_1_to_2_init=idx_init[None],
        max_iter=ts.max_iter,
        lambda_init=ts.lambda_init,
        convergence_thresh=ts.convergence_thresh,
        dist_thresh=ts.dist_thresh,
        radius=ts.radius,
        dilation_max=ts.dilation_max,
        refine_gate=ts.refine_gate,
        refine_budget_frac=ts.refine_budget_frac,
        refine_subset_dilations=ts.refine_subset_dilations,
        refine_final_radius=ts.refine_final_radius,
        proj_gate=ts.proj_gate,
        proj_init=ts.proj_init,
        proj_pre_iters=ts.proj_pre_iters,
        proj_budget_frac=ts.proj_budget_frac,
    )
    idx_f2k = idx_f2k[0]  # (N,)
    valid_match = valid_match[0]  # (N, 1)

    Xii_f = Xii.reshape(N, 3)
    Cii_f = Cii.reshape(N, 1)
    Qii_f = Qii.reshape(N, 1)
    Xji_f = Xji.reshape(N, 3)
    Cji_f = Cji.reshape(N, 1)
    Qji_f = Qji.reshape(N, 1)

    # 2. fuse the new canonical observation into the frame pointmap
    # (tracker.py:44; all six filtering modes + best_score state threaded)
    frame_X, frame_C, frame_n_fused, frame_n_updates, frame_score = fuse_pointmap(
        frame_X, frame_C, frame_n_fused, frame_n_updates, Xii_f, Cii_f,
        score=frame_score, mode=ts.filtering_mode, score_mode=ts.filtering_score,
    )

    # 3. gather correspondences + confidence gating (tracker.py:54-70)
    Xf_all = frame_X
    Xk_all = kf_X
    Cf_avg = frame_C / frame_n_fused.astype(frame_C.dtype)
    Ck_avg = kf_C / jnp.maximum(kf_n_fused.astype(kf_C.dtype), 1.0)

    if ts.use_calib:
        Xf_all = constrain_points_to_ray(img_hw, Xf_all, K)
        Xk_all = constrain_points_to_ray(img_hw, Xk_all, K)

    # one wide-row gather instead of three (rows are billed per row on TPU)
    gathered = jnp.concatenate([Xf_all, Cf_avg, Qii_f], axis=-1)[idx_f2k]
    Xf = gathered[:, 0:3]
    Cf = gathered[:, 3:4]
    Qk = jnp.sqrt(gathered[:, 4:5] * Qji_f)

    valid_Cf = Cf > ts.C_conf
    valid_Ck = Ck_avg > ts.C_conf
    valid_Q = Qk > ts.Q_conf
    valid_opt = valid_match & valid_Cf & valid_Ck & valid_Q
    valid_kf = valid_match & valid_Q

    match_frac = jnp.mean(valid_opt.astype(jnp.float32))

    # 4. GN pose solve for T_CkCf
    T_CkCf_init = sim3.rel(T_WCk, T_WCf)
    if ts.use_calib:
        uv = get_pixel_coords(img_hw, dtype=Xk_all.dtype).reshape(-1, 2)
        zk = Xk_all[..., 2:3]
        valid_meas = zk > ts.gn.depth_eps
        logz = jnp.where(valid_meas, jnp.log(jnp.maximum(zk, ts.gn.depth_eps)), 0.0)
        meas_k = jnp.concatenate([uv, logz], axis=-1) * valid_meas
        T_CkCf, cost, ok = opt_pose_calib_sim3(
            Xf, Xk_all, T_CkCf_init, Qk, valid_opt.astype(Xf.dtype),
            meas_k, valid_meas, K, img_hw, ts.gn,
        )
    else:
        T_CkCf, cost, ok = opt_pose_ray_dist_sim3(
            Xf, Xk_all, T_CkCf_init, Qk, valid_opt.astype(Xf.dtype), ts.gn
        )

    T_WCf_new = sim3.mul(T_WCk, T_CkCf)

    # 5. fuse keyframe pointmap with its re-observation (tracker.py:96-101)
    Xkk = sim3.act(T_CkCf, Xji_f)
    kX, kC, kn, knu, ks = fuse_pointmap(
        kf_X, kf_C, kf_n_fused, kf_n_updates, Xkk, Cji_f,
        score=kf_score, mode=ts.filtering_mode, score_mode=ts.filtering_score,
    )

    # 6. keyframe decision stats (tracker.py:103-110).  hit[j] = 1 iff some
    # VALID keyframe pixel matched frame pixel j; scatter-set with dropped
    # invalid rows is exactly scatter-max of the 0/1 validity and measured
    # ~30% cheaper (scripts/microbench_scatter.py).
    match_frac_k = jnp.mean(valid_kf.astype(jnp.float32))
    # A strided-subset estimate of this scatter is a measured dead end: no
    # time win (the strided index read costs what the smaller scatter
    # saves) and the subsample heavily overestimates uniqueness under
    # collisions (scripts/microbench_unique.py, 2026-08-20).
    idx_hit = jnp.where(valid_match[:, 0], idx_f2k, N)
    hit = jnp.zeros((N,), dtype=jnp.float32).at[idx_hit].set(1.0, mode="drop")
    unique_frac_f = jnp.sum(hit) / N

    # decision scalars packed into ONE tiny array: the host reads them with
    # a single transfer instead of five (each lazy scalar fetch is a full
    # device round-trip).  The new pose rides along as stats[8:16] so the
    # engine's trajectory log needs NO second blocking fetch per frame
    # (VERDICT r4 item 1: track_finish + _log share a single readback).
    stats = jnp.concatenate([
        jnp.stack([
            match_frac,
            match_frac_k,
            unique_frac_f,
            ok.astype(jnp.float32),
            frame_n_fused.astype(jnp.float32),
            frame_n_updates.astype(jnp.float32),
            frame_score,
            cost,
        ]),
        T_WCf_new.astype(jnp.float32),
    ])

    return dict(
        idx_f2k=idx_f2k,
        # raw match validity + Q product: exactly the BACKWARD-direction
        # fields of the factor-graph edge (keyframe -> this frame) once the
        # frame becomes a keyframe — X11/X21 here are the backend's Xjj/Xij
        # for that edge, so match() and sqrt(Qii[idx]*Qji) coincide with
        # _add_factors_pair's idx_j2i/valid_i/Qi (global_opt.py:49-57).
        # Captured by the engine behind local_opt.reuse_tracker_match.
        match_valid=valid_match,
        match_Q=Qk,
        frame_X=frame_X,
        frame_C=frame_C,
        kf_X=kX,
        kf_C=kC,
        kf_n_fused=kn,
        kf_n_updates=knu,
        kf_score=ks,
        T_WCf=T_WCf_new,
        stats=stats,
    )


@partial(jax.jit, static_argnames=("ts", "img_hw"))
def _track_compute_chained(
    ts: TrackerSettings,
    img_hw: Tuple[int, int],
    Xii, Cii, Dii, Qii,
    Xji, Cji, Dji, Qji,
    kf_X, kf_C, kf_nf, kf_nu, kf_sc,   # PREVIOUS pending's post-fusion state
    T_WCs,                             # store poses (kf pose sliced in-jit)
    kf_idx,
    T_WCf,                             # previous pending's T_WCf (device)
    idx_init,                          # previous pending's idx_f2k (device)
    K,
):
    """`_track_compute` chained on the PREVIOUS pending frame's device
    outputs (depth-2 submit-ahead, VERDICT r4 item 1 follow-up): the next
    frame's tracking program is dispatched without waiting for the previous
    frame's decision readback.  Inputs are bitwise the values the
    sequential loop would pass when the previous frame commits WITHOUT a
    keyframe switch / reloc / GN failure — the pipelined loop re-submits
    through the normal store path on any other outcome, so trajectories
    stay identical.  The fresh frame's canonical state is its defaults
    (X zeros / C zeros / counts 0 / score -inf — Frame dataclass)."""
    H, W = img_hw
    N = H * W
    zX = jnp.zeros((N, 3), jnp.float32)
    zC = jnp.zeros((N, 1), jnp.float32)
    return _track_compute(
        ts, img_hw,
        Xii, Cii, Dii, Qii, Xji, Cji, Dji, Qji,
        zX, zC,
        jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
        jnp.asarray(-jnp.inf, jnp.float32),
        kf_X, kf_C, kf_nf, kf_nu, kf_sc,
        T_WCf, T_WCs[kf_idx], idx_init, K,
    )


@partial(jax.jit, static_argnames=("ts", "img_hw"))
def _track_compute_stored(
    ts: TrackerSettings,
    img_hw: Tuple[int, int],
    Xii, Cii, Dii, Qii,
    Xji, Cji, Dji, Qji,
    frame_X, frame_C, frame_n_fused, frame_n_updates, frame_score,
    kf_Xs, kf_Cs, kf_nfs, kf_nus, kf_scs, T_WCs,   # FULL store arrays
    kf_slot,
    kf_idx,
    T_WCf,
    idx_init,
    K,
):
    """`_track_compute` with the keyframe slice folded in.

    Passing the store arrays and slicing in-jit removes the separate
    per-frame slice dispatch (material over a ~10 ms/dispatch remote
    tunnel; free locally — inputs are read-only references, XLA fuses the
    dynamic-slice into the consumers).  Semantically identical to
    slices() + `_track_compute`.  ``kf_slot`` indexes the PAGED arrays
    (X/C — device slot under keyframe paging), ``kf_idx`` the always-
    resident scalar state (frame.py Keyframes paging)."""
    return _track_compute(
        ts, img_hw,
        Xii, Cii, Dii, Qii, Xji, Cji, Dji, Qji,
        frame_X, frame_C, frame_n_fused, frame_n_updates, frame_score,
        kf_Xs[kf_slot], kf_Cs[kf_slot], kf_nfs[kf_idx], kf_nus[kf_idx],
        kf_scs[kf_idx], T_WCf, T_WCs[kf_idx], idx_init, K,
    )


class FrameTracker:
    """Host orchestration + decisions around ``_track_compute``.

    Pipeline mode (``engine.pipeline: 2``): ``compute_device`` places the
    post-inference program (`_track_compute`) on a SECOND chip, so it runs
    concurrently with the next frame's encode+decode on the model chip —
    the two halves of the ~32 ms frame are nearly equal (VERDICT r2 item 3).
    ``infer()`` / ``track()`` are split so the engine can issue the next
    frame's (speculative) decode before blocking on this frame's decision.
    """

    def __init__(self, model, cfg, keyframes: Keyframes, img_hw: Tuple[int, int],
                 compute_device=None):
        self.model = model
        self.ts = TrackerSettings.from_config(cfg)
        self.keyframes = keyframes
        self.img_hw = img_hw
        self.compute_device = compute_device
        # (tracked-against kf_idx, idx, valid, Q) of the newest keyframe's
        # own match — see track_finish
        self.last_match_capture = None
        # host copy of the most recent stats readback (16 floats) — set by
        # track_finish; consumers that need the same scalars again (bench
        # harness) read this instead of paying a second device fetch
        self.last_stats = None
        self.reset_idx_f2k()

    def reset_idx_f2k(self):
        N = self.img_hw[0] * self.img_hw[1]
        self.idx_f2k = jnp.arange(N, dtype=jnp.int32)
        if self.compute_device is not None:
            self.idx_f2k = jax.device_put(self.idx_f2k, self.compute_device)

    def _kf_tokens(self, kf_idx: int):
        """(feat_k, pos_k) of the keyframe, cached on the host: a slot's
        tokens never mutate (only a pop+append reuses a slot, which bumps
        the store generation) — saves one slice dispatch on every frame
        that tracks against the same keyframe."""
        kf = self.keyframes
        key = (kf_idx, kf.generation)
        cached = getattr(self, "_tok_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        sl = kf.feat_slices(kf_idx)
        self._tok_cache = (key, sl)
        return sl

    def infer(self, frame: Frame):
        """Issue the asymmetric two-view inference for `frame` against the
        CURRENT last keyframe (async dispatch on the model device).

        Returns (kf_idx, outputs); pass to :meth:`track`.  In pipeline mode
        this is issued speculatively before the previous frame's keyframe
        decision lands — `track` re-issues if the keyframe changed.
        """
        kf = self.keyframes
        kf_idx = kf.last_idx()
        # feat/pos of an existing slot never mutate, so reusing them at
        # track time is exact (host-cached per keyframe; the pointmap side
        # is sliced INSIDE `_track_compute_stored`)
        feat_k, pos_k = self._kf_tokens(kf_idx)
        out = self.model.asymmetric(frame.feat, frame.pos, feat_k, pos_k)
        return kf_idx, out

    def track_submit(self, frame: Frame, inference=None):
        """Issue `_track_compute` for `frame` (async dispatch; no host sync).

        `inference`: optional (kf_idx, outputs) from :meth:`infer` — reused
        when it still targets the current last keyframe, re-issued otherwise
        (the pipeline-mode speculation correction: a keyframe switch happens
        ~1 in 5-10 frames, VERDICT r2 item 3).  Returns (frame, out-dict).
        """
        kf = self.keyframes
        kf_idx = kf.last_idx()
        K = kf.K if self.ts.use_calib else jnp.eye(3, dtype=jnp.float32)

        # pointmap-side state is passed as the FULL store arrays and sliced
        # INSIDE `_track_compute_stored` (always-fresh snapshot; one fewer
        # device dispatch per frame).  In pipeline mode the previous frame's
        # finish fuses the keyframe pointmap after the speculative infer —
        # the snapshot below is taken after that finish, so it is current.
        snap = kf.snapshot()

        if inference is not None and inference[0] == kf_idx:
            (Xii, Cii, Dii, Qii), (Xji, Cji, Dji, Qji) = inference[1]
        else:
            feat_k, pos_k = self._kf_tokens(kf_idx)
            (Xii, Cii, Dii, Qii), (Xji, Cji, Dji, Qji) = self.model.asymmetric(
                frame.feat, frame.pos, feat_k, pos_k
            )

        N = self.img_hw[0] * self.img_hw[1]
        frame_X = frame.X_canon if frame.X_canon is not None else jnp.zeros((N, 3), dtype=jnp.float32)
        frame_C = frame.C if frame.C is not None else jnp.zeros((N, 1), dtype=jnp.float32)

        dev = self.compute_device
        if dev is not None:
            # pipeline mode: move the decode outputs + per-frame state to the
            # tracker chip; the keyframe store's pointmap arrays already live
            # there (Keyframes(device=...)), so `_track_compute` dispatches
            # on it while the model chip starts the next frame
            (Xii, Cii, Dii, Qii, Xji, Cji, Dji, Qji, frame_X, frame_C, K) = (
                jax.device_put(
                    (Xii, Cii, Dii, Qii, Xji, Cji, Dji, Qji, frame_X, frame_C, K),
                    dev,
                )
            )

        out = _track_compute_stored(
            self.ts,
            self.img_hw,
            Xii, Cii, Dii, Qii,
            Xji, Cji, Dji, Qji,
            frame_X,
            frame_C,
            jnp.asarray(frame.n_fused, dtype=jnp.int32),
            jnp.asarray(frame.n_updates, dtype=jnp.int32),
            jnp.asarray(frame.score, dtype=jnp.float32),
            snap.X, snap.C, snap.n_fused, snap.n_updates, snap.score,
            snap.T_WC,
            jnp.asarray(int(snap.slot_of[kf_idx]), dtype=jnp.int32),
            jnp.asarray(kf_idx, dtype=jnp.int32),
            jax.device_put(frame.T_WC, dev) if dev is not None else frame.T_WC,
            self.idx_f2k,
            K,
        )
        return frame, kf_idx, out

    def track_submit_chained(self, frame: Frame, inference, prev_pending):
        """Depth-2 submit-ahead: issue `_track_compute` for `frame` chained
        on the PREVIOUS pending frame's device outputs — post-fusion
        keyframe state, new pose (warm start) and match indices — without
        any host readback in between.

        Exact (bitwise the sequential values) when the previous frame's
        decision turns out to be a clean non-keyframe commit; the engine
        discards and re-submits through :meth:`track_submit` otherwise
        (keyframe switch ~1 in cadence frames, reloc/GN-fail rare).
        `inference` must target the same keyframe as `prev_pending`.
        Returns (frame, kf_idx, out) like :meth:`track_submit`."""
        _, kf_idx, pout = prev_pending
        kf = self.keyframes
        K = kf.K if self.ts.use_calib else jnp.eye(3, dtype=jnp.float32)
        (Xii, Cii, Dii, Qii), (Xji, Cji, Dji, Qji) = inference[1]
        # only the keyframe POSE is read from the store (a backend
        # write-back may land between frames — the sequential loop would
        # see it too); the pointmap-side keyframe state chains on the
        # previous program's outputs, which ARE the values its commit
        # scatter stores
        snap = kf.snapshot()
        out = _track_compute_chained(
            self.ts,
            self.img_hw,
            Xii, Cii, Dii, Qii,
            Xji, Cji, Dji, Qji,
            pout["kf_X"], pout["kf_C"], pout["kf_n_fused"],
            pout["kf_n_updates"], pout["kf_score"],
            snap.T_WC,
            jnp.asarray(kf_idx, dtype=jnp.int32),
            pout["T_WCf"],
            pout["idx_f2k"],
            K,
        )
        return frame, kf_idx, out

    def track_finish(self, pending):
        """Block on the decision stats, commit state, decide keyframe/reloc.

        This is the ONE blocking device readback of a tracked frame: the
        16-float stats vector carries both the decision scalars and the new
        pose (stats[8:16]), so the trajectory log reuses it instead of
        fetching ``frame.T_WC`` again (VERDICT r4 item 1)."""
        frame, kf_idx, out = pending
        kf = self.keyframes
        self.idx_f2k = out["idx_f2k"]

        import numpy as np

        stats = np.asarray(out["stats"])
        self.last_stats = stats  # host copy, reusable by callers (bench)
        (match_frac, match_frac_k, unique_frac_f, gn_ok, n_fused, n_updates,
         frame_score, _) = stats[:8]

        # low overlap -> relocalise (tracker.py:66-70);
        # GN/Cholesky failure -> skip frame (tracker.py:91-93)
        if match_frac < self.ts.min_match_frac or not gn_ok:
            return False, True

        # commit frame + keyframe state (brief lock inside update_pointmap;
        # only tracking fuses pointmaps, so the slot cannot have torn)
        frame.X_canon = out["frame_X"]
        frame.C = out["frame_C"]
        frame.n_fused = int(n_fused)
        frame.n_updates = int(n_updates)
        frame.score = float(frame_score)
        frame.T_WC = out["T_WCf"]
        frame.T_WC_np = stats[8:16]
        kf.update_pointmap(kf_idx, out["kf_X"], out["kf_C"], out["kf_n_fused"],
                           out["kf_n_updates"], out["kf_score"])

        new_kf = min(match_frac_k, unique_frac_f) < self.ts.match_frac_thresh
        if new_kf:
            # capture this frame's match products: once the frame is appended
            # as keyframe k, they ARE the backward direction of the
            # consecutive factor-graph edge (k-1, k) — see _track_compute's
            # return docstring.  The engine hands them to
            # FactorGraph.add_factors behind local_opt.reuse_tracker_match.
            self.last_match_capture = (
                kf_idx, out["idx_f2k"], out["match_valid"], out["match_Q"]
            )
            self.reset_idx_f2k()
        return new_kf, False

    def track(self, frame: Frame, inference=None):
        """Returns (new_kf, try_reloc).

        Concurrency: all device work here (asymmetric inference, the jitted
        `_track_compute`, the stats readback) runs on an immutable SNAPSHOT
        of the keyframe store — the store lock is held only inside
        ``snapshot()`` and ``update_pointmap`` (reference swaps), so a
        backend task's global solve never stalls tracking (the reference's
        lock scope, frame.py:222 / main.py:225).
        """
        return self.track_finish(self.track_submit(frame, inference))
