"""Frames, pointmap fusion, and the fixed-capacity keyframe store.

TPU re-design of /root/reference/mast3r_slam/frame.py: the reference keeps a
512-slot shared-CUDA-memory SoA ring (``SharedKeyframes``) guarded by an
RLock across 3 processes.  Here the same SoA layout is a single device-resident
pytree of fixed-capacity jnp arrays updated functionally (``.at[]``) — static
shapes for every jit signature, no locks (single host loop), and trivially
shardable across a mesh later.
"""

from __future__ import annotations

import dataclasses
import threading
from enum import IntEnum
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..lie import sim3
from ..utils.numerics import vnorm


class Mode(IntEnum):
    INIT = 0
    TRACKING = 1
    RELOC = 2
    TERMINATED = 3


# ---------------------------------------------------------------------------
# pointmap fusion (frame.py:41-108)
# ---------------------------------------------------------------------------

FILTERING_MODES = (
    "first", "recent", "best_score", "indep_conf",
    "weighted_pointmap", "weighted_spherical",
)


def pointmap_score(C_new, score_mode: str = "median"):
    """Aggregate confidence score for ``best_score`` fusion (frame.py:33-38)."""
    if score_mode == "median":
        return jnp.median(C_new)
    if score_mode == "mean":
        return jnp.mean(C_new)
    raise ValueError(f"unknown filtering_score {score_mode}")


def fuse_pointmap(X, C, n_fused, n_updates, X_new, C_new, score=None,
                  mode: str = "weighted_pointmap", score_mode: str = "median"):
    """One fusion step of a canonical pointmap — jit-safe for every mode.

    X, X_new: (N, 3); C, C_new: (N, 1); n_fused / n_updates: scalar int32
    counts (the reference's ``N`` / ``N_updates``, frame.py:29-30); score:
    scalar f32 (``-inf`` when unused).  Returns
    (X', C', n_fused', n_updates', score').

    Reference semantics mirrored exactly (frame.py:41-105): the very first
    observation (``n_updates == 0``) always installs the new map; thereafter
    ``first`` replaces once more on the SECOND observation then freezes,
    ``recent`` always replaces, ``best_score`` replaces when the new map's
    aggregate confidence beats the stored score, ``indep_conf`` picks the
    higher-confidence pixel (and resets N to 1), ``weighted_pointmap``
    confidence-weight-averages, ``weighted_spherical`` averages in
    (r, phi, theta).
    """
    n_fused = jnp.asarray(n_fused, jnp.int32)
    n_updates = jnp.asarray(n_updates, jnp.int32)
    if score is None:
        score = -jnp.inf
    score = jnp.asarray(score, jnp.float32)
    one = jnp.ones_like(n_fused)

    if mode == "first":
        # frame.py:53-57: replaces exactly on the second observation
        take = n_updates == 1
        Xo = jnp.where(take, X_new, X)
        Co = jnp.where(take, C_new, C)
        no = jnp.where(take, one, n_fused)
        so = score
    elif mode == "recent":
        Xo, Co, no, so = X_new, C_new, one, score
    elif mode == "best_score":
        new_score = pointmap_score(C_new, score_mode)
        take = new_score > score
        Xo = jnp.where(take, X_new, X)
        Co = jnp.where(take, C_new, C)
        no = jnp.where(take, one, n_fused)
        so = jnp.maximum(new_score, score)
    elif mode == "indep_conf":
        take = C_new > C
        Xo = jnp.where(take, X_new, X)
        Co = jnp.where(take, C_new, C)
        no = one  # frame.py:73: N = 1 unconditionally
        so = score
    elif mode == "weighted_pointmap":
        Xo = (C * X + C_new * X_new) / (C + C_new)
        Co = C + C_new
        no = n_fused + 1
        so = score
    elif mode == "weighted_spherical":
        def to_sph(P):
            r = vnorm(P)  # VPU-exact (utils.numerics)
            x, y, z = P[..., 0:1], P[..., 1:2], P[..., 2:3]
            return jnp.concatenate(
                [r, jnp.arctan2(y, x),
                 jnp.arccos(jnp.clip(z / jnp.maximum(r, 1e-12), -1, 1))], axis=-1
            )

        def to_cart(s):
            r, phi, theta = s[..., 0:1], s[..., 1:2], s[..., 2:3]
            st = jnp.sin(theta)
            return jnp.concatenate(
                [r * st * jnp.cos(phi), r * st * jnp.sin(phi), r * jnp.cos(theta)],
                axis=-1,
            )

        s = (C * to_sph(X) + C_new * to_sph(X_new)) / (C + C_new)
        Xo = to_cart(s)
        Co = C + C_new
        no = n_fused + 1
        so = score
    else:
        raise ValueError(f"unknown filtering_mode {mode}")

    # first-ever observation installs the new map verbatim (frame.py:44-51)
    is_init = n_updates == 0
    init_score = (
        pointmap_score(C_new, score_mode) if mode == "best_score" else score
    )
    return (
        jnp.where(is_init, X_new, Xo),
        jnp.where(is_init, C_new, Co),
        jnp.where(is_init, one, no),
        n_updates + 1,
        jnp.where(is_init, init_score, so),
    )


# ---------------------------------------------------------------------------
# Frame
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Frame:
    """Host-side view of one frame's device arrays (frame.py:17-108)."""

    frame_id: int
    img: jnp.ndarray          # (3, H, W) normalized
    T_WC: jnp.ndarray         # (8,) Sim3
    X_canon: Optional[jnp.ndarray] = None  # (N, 3)
    C: Optional[jnp.ndarray] = None        # (N, 1) summed confidence
    n_fused: int = 0          # reference `N` (frame.py:29)
    n_updates: int = 0        # reference `N_updates` (frame.py:30)
    feat: Optional[jnp.ndarray] = None     # (1, P, D) encoder tokens
    pos: Optional[jnp.ndarray] = None      # (1, P, 2)
    K: Optional[jnp.ndarray] = None
    score: float = -np.inf
    uimg: Optional[np.ndarray] = None      # (H, W, 3) for viz/export
    # host copy of T_WC, populated by the tracker's single stats readback
    # (stats[8:16]) — lets the engine log the pose without a second blocking
    # device fetch per frame (VERDICT r4 item 1)
    T_WC_np: Optional[np.ndarray] = None

    def update_pointmap(self, X_new, C_new, mode="weighted_pointmap",
                        score_mode="median"):
        if self.n_updates == 0 or self.X_canon is None:
            self.X_canon, self.C = X_new, C_new
            self.n_fused, self.n_updates = 1, 1
            if mode == "best_score":
                self.score = float(pointmap_score(C_new, score_mode))
            return
        X, C, n, nu, score = fuse_pointmap(
            self.X_canon, self.C, self.n_fused, self.n_updates, X_new, C_new,
            score=self.score, mode=mode, score_mode=score_mode,
        )
        self.X_canon, self.C = X, C
        self.n_fused = int(n)
        self.n_updates = int(nu)
        self.score = float(score)

    def average_conf(self):
        return self.C / self.n_fused if self.C is not None else None


# ---------------------------------------------------------------------------
# Keyframe store (SoA, fixed capacity)
# ---------------------------------------------------------------------------

@jax.jit
def _scatter_kf_state(X, C, nf, nu, sc, slot, idx, Xn, Cn, nfn, nun, scn):
    # X/C are PAGED arrays indexed by device slot; the scalar state arrays
    # are always-resident, indexed by logical keyframe index
    return (X.at[slot].set(Xn), C.at[slot].set(Cn), nf.at[idx].set(nfn),
            nu.at[idx].set(nun), sc.at[idx].set(jnp.asarray(scn, sc.dtype)))


@jax.jit
def _kf_slices(X, C, nf, nu, sc, T, feat, pos, slot, idx):
    return (X[slot], C[slot], nf[idx], nu[idx], sc[idx], T[idx],
            feat[slot][None], pos[slot][None])


@jax.jit
def _kf_slices_pm(X, C, nf, nu, sc, T, slot, idx):
    return X[slot], C[slot], nf[idx], nu[idx], sc[idx], T[idx]


@jax.jit
def _kf_slices_feat(feat, pos, slot):
    return feat[slot][None], pos[slot][None]


@jax.jit
def _upload_rows(X, C, feat, pos, slot, Xn, Cn, featn, posn):
    """Re-materialise one evicted keyframe's paged rows (one dispatch)."""
    return (X.at[slot].set(Xn), C.at[slot].set(Cn),
            feat.at[slot].set(featn), pos.at[slot].set(posn))


class KeyframeSnapshot(NamedTuple):
    """Consistent view of the store taken under its lock.

    Because jnp arrays are immutable, a snapshot is just the attribute
    references — the lock only guarantees they come from the same moment
    (no torn multi-array view across a concurrent append/write-back).  This
    is what lets backend tasks run LOCK-FREE on hundreds-of-ms device work:
    the reference holds its RLock only around ring-buffer accesses for the
    same reason (frame.py:222, main.py:225).

    ``slot_of`` maps logical keyframe index -> device slot of the PAGED
    arrays (X, C, feat, pos); -1 = evicted to host.  The mapping is copied
    under the lock, so it is consistent with the array references even if
    a concurrent eviction swaps slots afterwards (the snapshot's immutable
    arrays still hold the pre-eviction rows).
    """

    n: int
    generation: int
    T_WC: jnp.ndarray
    X: jnp.ndarray
    C: jnp.ndarray
    n_fused: jnp.ndarray
    n_updates: jnp.ndarray
    score: jnp.ndarray
    feat: jnp.ndarray
    pos: jnp.ndarray
    K: Optional[jnp.ndarray]
    slot_of: np.ndarray


class Keyframes:
    """Device-resident SoA keyframe buffer (cap slots, frame.py:220-327).

    All arrays are preallocated with static shapes; ``n`` is the host-side
    fill count.  Functional updates keep every jit signature stable.

    Thread safety: the store carries its OWN lock (the role of the
    reference's per-structure manager RLock, frame.py:222).  Every mutating
    method takes it; readers that need a consistent multi-array view call
    :meth:`snapshot`.  The lock is held only for reference swaps — never
    across device compute — so frontend tracking and backend optimisation
    genuinely overlap.  ``generation`` increments whenever an existing slot's
    identity changes (``pop_last``), invalidating in-flight backend
    write-backs.
    """

    def __init__(self, capacity: int, num_pixels: int, num_patches: int,
                 feat_dim: int, dtype=jnp.float32, device=None,
                 device_budget: int = 0, keep_recent: int = 64):
        self.capacity = capacity
        self.num_pixels = num_pixels
        self.n = 0
        self.lock = threading.RLock()
        self.generation = 0
        # pipeline mode (engine.pipeline: 2): `device` commits the POINTMAP
        # side of the store (X/C/counts/poses — everything `_track_compute`
        # and the global solve consume) to the tracker chip, while feat/pos
        # (everything the encoder/decoder consumes) stay on the model chip —
        # the data split that lets the two frame halves run on two chips.
        self.device = device
        self._dev = (lambda a: jax.device_put(a, device)) if device else (lambda a: a)
        # long-video memory plan (VERDICT r4 item 3): the PAGED arrays
        # (X, C, feat, pos — ~6 MB/keyframe at production scale) live in a
        # fixed pool of `device_budget` slots; keyframes outside the solve
        # window whose slots are needed are EVICTED to host RAM and
        # re-uploaded on demand (loop closure / reloc to an old keyframe).
        # 0 = unbounded residency (the paged arrays grow with capacity —
        # the pre-r5 behaviour).  Scalar state (poses, counters) is tiny
        # and always resident.  `keep_recent`: the newest keyframes are
        # never evicted (must cover the solve window).
        self.paging = bool(device_budget)
        self.dcap = min(device_budget, capacity) if self.paging else capacity
        self.keep_recent = keep_recent
        # graph-managed: old keyframes referenced as pinned context by
        # current window edges — evicting them would thrash (re-upload
        # every solve); correctness never depends on this set
        self.sticky: set = set()
        self.slot_of = np.full((capacity,), -1, dtype=np.int32)
        self._slot_owner = np.full((self.dcap,), -1, dtype=np.int32)
        self._free_slots = set(range(self.dcap))
        self._host_rows: dict = {}  # idx -> dict(X, C, feat, pos, ver)
        self.n_evictions = 0
        self.frame_id = np.full((capacity,), -1, dtype=np.int64)
        self.T_WC = self._dev(jnp.tile(sim3.identity(dtype=dtype), (capacity, 1)))
        self.X = self._dev(jnp.zeros((self.dcap, num_pixels, 3), dtype=dtype))
        self.C = self._dev(jnp.zeros((self.dcap, num_pixels, 1), dtype=dtype))
        self.n_fused = self._dev(jnp.zeros((capacity,), dtype=jnp.int32))
        self.n_updates = self._dev(jnp.zeros((capacity,), dtype=jnp.int32))
        self.score = self._dev(jnp.full((capacity,), -jnp.inf, dtype=dtype))
        self.feat = jnp.zeros((self.dcap, num_patches, feat_dim), dtype=dtype)
        self.pos = jnp.zeros((self.dcap, num_patches, 2), dtype=jnp.int32)
        self.K: Optional[jnp.ndarray] = None
        # host-side per-keyframe POINTMAP version counter: bumped on every
        # X/C mutation (set_frame / update_pointmap).  Consumers that cache
        # derived per-keyframe data (the factor graph's gathered-point
        # cache) compare stamps to decide what to refresh — zero device cost
        self.pm_version = np.zeros((capacity,), dtype=np.int64)
        # host-side metadata for viz/export
        self.uimgs = [None] * capacity

    def __len__(self):
        return self.n

    def append(self, frame: Frame) -> int:
        with self.lock:
            idx = self.n
            self._ensure_capacity(idx + 1)
            self.set_frame(idx, frame)
            self.n = idx + 1
            return idx

    def snapshot(self) -> KeyframeSnapshot:
        """Consistent reference-view of the store (see class docstring)."""
        with self.lock:
            return KeyframeSnapshot(
                n=self.n,
                generation=self.generation,
                T_WC=self.T_WC,
                X=self.X,
                C=self.C,
                n_fused=self.n_fused,
                n_updates=self.n_updates,
                score=self.score,
                feat=self.feat,
                pos=self.pos,
                K=self.K,
                slot_of=self.slot_of.copy(),
            )

    # ------------------------------------------------------------------
    # paging (VERDICT r4 item 3 — long-video memory plan)
    # ------------------------------------------------------------------

    def device_bytes(self) -> int:
        """Bytes of the store's device arrays (the plateau the paging
        policy bounds; asserted by tests/test_paging.py)."""
        return sum(
            a.size * a.dtype.itemsize
            for a in (self.X, self.C, self.feat, self.pos, self.T_WC,
                      self.n_fused, self.n_updates, self.score)
        )

    def _alloc_slot(self, idx: int, protect=()) -> int:
        """Find a device slot for keyframe `idx` (caller holds the lock).

        Prefers slot == idx so the mapping stays IDENTITY until the pool
        is actually contended — the full-graph solve indexes the paged
        arrays by pose index and relies on the identity prefix (asserted
        at the call site; windowed solves translate explicitly)."""
        if not self._free_slots:
            victim = self._pick_victim(protect)
            if victim is None:
                # soft budget: nothing evictable (window wider than the
                # pool) — grow the paged arrays rather than deadlock
                print(
                    "keyframe paging: no evictable keyframe; growing the "
                    f"device pool past budget ({self.dcap} slots)"
                )
                self._grow_paged(self.dcap * 2)
            else:
                self._evict_locked(victim)
        slot = idx if idx in self._free_slots else min(self._free_slots)
        self._free_slots.remove(slot)
        self.slot_of[idx] = slot
        self._slot_owner[slot] = idx
        return slot

    def _pick_victim(self, protect=()):
        """Oldest resident keyframe outside keep-recent / sticky / protect."""
        recent_floor = self.n - self.keep_recent
        owners = self._slot_owner[self._slot_owner >= 0]
        cands = [
            int(i) for i in np.sort(owners)
            if i < recent_floor and i not in self.sticky and i not in protect
        ]
        return cands[0] if cands else None

    def _evict_locked(self, idx: int):
        """Move keyframe `idx`'s paged rows to host RAM and free its slot.
        The device->host fetch is skipped when the host copy is already
        current (version-stamped) — re-evicting an immutable old keyframe
        after a transient re-upload costs nothing."""
        slot = int(self.slot_of[idx])
        ver = int(self.pm_version[idx])
        h = self._host_rows.get(idx)
        if h is None or h["ver"] != ver:
            self._host_rows[idx] = dict(
                X=np.asarray(self.X[slot]),
                C=np.asarray(self.C[slot]),
                feat=np.asarray(self.feat[slot]),
                pos=np.asarray(self.pos[slot]),
                ver=ver,
            )
        self.slot_of[idx] = -1
        self._slot_owner[slot] = -1
        self._free_slots.add(slot)
        self.n_evictions += 1

    def ensure_resident(self, idxs) -> None:
        """Upload any evicted keyframes in `idxs` back into device slots
        (loop-closure / reloc to old keyframes, windowed-solve pinned
        context).  No-op for resident keyframes; correctness of concurrent
        readers is unaffected (snapshots stay self-consistent)."""
        idxs = [int(i) for i in idxs]
        with self.lock:
            protect = set(idxs)
            for idx in sorted(idxs):
                if idx >= self.n or self.slot_of[idx] >= 0:
                    continue
                h = self._host_rows[idx]
                slot = self._alloc_slot(idx, protect=protect)
                self.X, self.C, self.feat, self.pos = _upload_rows(
                    self.X, self.C, self.feat, self.pos, slot,
                    self._dev(jnp.asarray(h["X"])),
                    self._dev(jnp.asarray(h["C"])),
                    jnp.asarray(h["feat"]),
                    jnp.asarray(h["pos"]),
                )

    def is_resident(self, idx: int) -> bool:
        return self.slot_of[idx] >= 0

    def pointmap_np(self, idx: int):
        """(X, C_raw) of one keyframe as numpy, resident or evicted —
        for export/viz/checkpoint readers that walk the whole map."""
        with self.lock:
            slot = int(self.slot_of[idx])
            if slot >= 0:
                return np.asarray(self.X[slot]), np.asarray(self.C[slot])
            h = self._host_rows[idx]
            return h["X"], h["C"]

    def feat_np(self, idx: int):
        """(feat, pos) of one keyframe as numpy, resident or evicted."""
        with self.lock:
            slot = int(self.slot_of[idx])
            if slot >= 0:
                return np.asarray(self.feat[slot]), np.asarray(self.pos[slot])
            h = self._host_rows[idx]
            return h["feat"], h["pos"]

    def _grow_paged(self, new_dcap: int):
        """Grow the paged arrays (no-paging capacity growth, or the soft-
        budget escape hatch).  Caller holds the lock."""
        new_dcap = min(new_dcap, max(self.capacity, new_dcap))
        pad = new_dcap - self.dcap
        if pad <= 0:
            return

        def grow(a, fill=0):
            pad_widths = ((0, pad),) + ((0, 0),) * (a.ndim - 1)
            return jnp.pad(a, pad_widths, constant_values=fill)

        self.X = grow(self.X)
        self.C = grow(self.C)
        self.feat = grow(self.feat)
        self.pos = grow(self.pos)
        self._slot_owner = np.concatenate(
            [self._slot_owner, np.full(pad, -1, np.int32)]
        )
        self._free_slots.update(range(self.dcap, new_dcap))
        self.dcap = new_dcap

    def write_back_poses(self, start: int, n_snapshot: int, generation: int,
                         T_new, src_offset: int = None) -> bool:
        """Install solved poses [start:n_snapshot] from a backend task.

        ``T_new`` rows [src_offset : src_offset + (n_snapshot - start)] are
        written (src_offset defaults to ``start`` — the full-graph solve
        passes its pose array aligned with the store; the WINDOWED solve
        passes a compact array whose free poses sit after its pinned block).

        Rejected (returns False) when the snapshot's slots no longer mean the
        same keyframes (a pop_last bumped ``generation``).  Appends since the
        snapshot are fine: slots < n_snapshot are untouched by append, and the
        newer keyframes keep their tracked poses — the same staleness the
        reference tolerates across its process boundary (main.py:225).
        """
        if src_offset is None:
            src_offset = start
        with self.lock:
            if self.generation != generation or self.n < n_snapshot:
                return False
            # _dev: a mesh-sharded solve returns mesh-REPLICATED poses; the
            # store may be committed to the tracker chip (pipeline mode) —
            # land the rows there before the scatter
            self.T_WC = self.T_WC.at[start:n_snapshot].set(
                self._dev(
                    jnp.asarray(
                        T_new[src_offset : src_offset + (n_snapshot - start)],
                        self.T_WC.dtype,
                    )
                )
            )
            return True

    def _ensure_capacity(self, needed: int):
        """Overflow policy for long-video ingest: the SoA doubles (pow2, so
        downstream solve-bucket recompiles stay rare) instead of asserting at
        the reference's fixed 512-slot cap (frame.py:221)."""
        if needed <= self.capacity:
            return
        # caller (append) already holds self.lock; growth swaps every
        # reference so it must be atomic wrt snapshot()
        new_cap = self.capacity
        while new_cap < needed:
            new_cap *= 2
        pad = new_cap - self.capacity

        def grow(a, fill=0):
            pad_widths = ((0, pad),) + ((0, 0),) * (a.ndim - 1)
            return jnp.pad(a, pad_widths, constant_values=fill)

        self.T_WC = jnp.concatenate(
            [self.T_WC, jnp.tile(sim3.identity(dtype=self.T_WC.dtype), (pad, 1))]
        )
        self.n_fused = grow(self.n_fused)
        self.n_updates = grow(self.n_updates)
        self.score = grow(self.score, fill=-jnp.inf)
        self.frame_id = np.concatenate(
            [self.frame_id, np.full((pad,), -1, dtype=np.int64)]
        )
        self.pm_version = np.concatenate(
            [self.pm_version, np.zeros((pad,), dtype=np.int64)]
        )
        self.slot_of = np.concatenate(
            [self.slot_of, np.full((pad,), -1, dtype=np.int32)]
        )
        self.uimgs = self.uimgs + [None] * pad
        self.capacity = new_cap
        if not self.paging:
            # unbounded residency: the paged arrays track logical capacity
            self._grow_paged(new_cap)

    def set_frame(self, idx: int, frame: Frame):
        # cast every incoming array at the store boundary: host-side frames
        # can carry f64/int64 (x64 mode, numpy defaults) and a mismatched
        # scatter warns today / errors in future jax
        with self.lock:
            self._set_frame_locked(idx, frame)

    def _set_frame_locked(self, idx: int, frame: Frame):
        self.frame_id[idx] = frame.frame_id
        self.pm_version[idx] += 1
        slot = int(self.slot_of[idx])
        if slot < 0:
            slot = self._alloc_slot(idx)
        self._host_rows.pop(idx, None)  # any host copy is now stale
        self.T_WC = self.T_WC.at[idx].set(
            self._dev(jnp.asarray(frame.T_WC, self.T_WC.dtype)))
        self.X = self.X.at[slot].set(
            self._dev(jnp.asarray(frame.X_canon, self.X.dtype)))
        self.C = self.C.at[slot].set(
            self._dev(jnp.asarray(frame.C, self.C.dtype)))
        self.n_fused = self.n_fused.at[idx].set(jnp.int32(frame.n_fused))
        self.n_updates = self.n_updates.at[idx].set(jnp.int32(frame.n_updates))
        self.score = self.score.at[idx].set(jnp.float32(frame.score))
        self.feat = self.feat.at[slot].set(
            jnp.asarray(frame.feat[0], self.feat.dtype))
        self.pos = self.pos.at[slot].set(jnp.asarray(frame.pos[0], self.pos.dtype))
        self.uimgs[idx] = frame.uimg

    def get_frame(self, idx: int) -> Frame:
        s = self.snapshot()
        slot = int(s.slot_of[idx])
        if slot >= 0:
            X, C = s.X[slot], s.C[slot]
            feat, pos = s.feat[slot][None], s.pos[slot][None]
        else:  # evicted: serve the host copy
            h = self._host_rows[idx]
            X, C = jnp.asarray(h["X"]), jnp.asarray(h["C"])
            feat, pos = jnp.asarray(h["feat"])[None], jnp.asarray(h["pos"])[None]
        return Frame(
            frame_id=int(self.frame_id[idx]),
            img=None,
            T_WC=s.T_WC[idx],
            X_canon=X,
            C=C,
            n_fused=int(s.n_fused[idx]),
            n_updates=int(s.n_updates[idx]),
            score=float(s.score[idx]),
            feat=feat,
            pos=pos,
            K=s.K,
            uimg=self.uimgs[idx],
        )

    def pop_last(self):
        with self.lock:
            self.n -= 1
            # slot identity changed: any in-flight backend write-back against
            # an older snapshot must be rejected
            self.generation += 1
            slot = int(self.slot_of[self.n])
            if slot >= 0:
                self.slot_of[self.n] = -1
                self._slot_owner[slot] = -1
                self._free_slots.add(slot)
            self._host_rows.pop(self.n, None)
            self.sticky.discard(self.n)

    def last_idx(self) -> int:
        return self.n - 1

    def update_pose(self, idx: int, T_WC):
        with self.lock:
            self.T_WC = self.T_WC.at[idx].set(T_WC)

    def update_poses(self, idxs, T_WCs):
        with self.lock:
            self.T_WC = self.T_WC.at[jnp.asarray(idxs)].set(T_WCs)

    def update_pointmap(self, idx: int, X, C, n_fused, n_updates=None,
                        score=None):
        # ONE fused dispatch for the per-frame commit (it runs every tracked
        # frame; five separate .at[].set ops cost five device dispatches —
        # material over the remote tunnel, noise locally but still free)
        with self.lock:
            self.pm_version[idx] += 1
            self._host_rows.pop(idx, None)  # host copy now stale
            slot = int(self.slot_of[idx])
            assert slot >= 0, "update_pointmap on an evicted keyframe"
            if n_updates is not None and score is not None:
                (self.X, self.C, self.n_fused, self.n_updates,
                 self.score) = _scatter_kf_state(
                    self.X, self.C, self.n_fused, self.n_updates, self.score,
                    slot, idx, X, C, n_fused, n_updates, score,
                )
                return
            self.X = self.X.at[slot].set(X)
            self.C = self.C.at[slot].set(C)
            self.n_fused = self.n_fused.at[idx].set(n_fused)
            if n_updates is not None:
                self.n_updates = self.n_updates.at[idx].set(n_updates)
            if score is not None:
                self.score = self.score.at[idx].set(score)

    def slices(self, idx: int):
        """One-dispatch consistent slice bundle for the tracker: (X, C,
        n_fused, n_updates, score, T_WC, feat[None], pos[None]) at idx.
        In pipeline mode the pointmap side lives on the tracker chip and
        feat/pos on the model chip, so the bundle is two dispatches."""
        s = self.snapshot()
        slot = int(s.slot_of[idx])
        assert slot >= 0, "slices() on an evicted keyframe"
        if self.device is None:
            return _kf_slices(s.X, s.C, s.n_fused, s.n_updates, s.score,
                              s.T_WC, s.feat, s.pos, slot, idx)
        pm = _kf_slices_pm(s.X, s.C, s.n_fused, s.n_updates, s.score,
                           s.T_WC, slot, idx)
        ft = _kf_slices_feat(s.feat, s.pos, slot)
        return (*pm, *ft)

    def feat_slices(self, idx: int):
        """(feat[None], pos[None]) at idx — the encoder-token side only
        (one dispatch).  Tokens of an existing slot never mutate."""
        s = self.snapshot()
        slot = int(s.slot_of[idx])
        if slot < 0:
            h = self._host_rows[idx]
            return jnp.asarray(h["feat"])[None], jnp.asarray(h["pos"])[None]
        return _kf_slices_feat(s.feat, s.pos, slot)

    def average_conf(self, idx: int):
        slot = int(self.slot_of[idx])
        assert slot >= 0, "average_conf() on an evicted keyframe"
        return self.C[slot] / jnp.maximum(
            self.n_fused[idx].astype(self.C.dtype), 1.0
        )
