"""SLAM map/graph checkpointing.

The reference has NO mid-run state persistence (SURVEY.md §5: outputs only at
termination).  Because the TPU engine keeps everything in fixed-capacity SoA
device arrays, a checkpoint is a straight serialisation of those arrays: the
keyframe store, factor-graph edges, retrieval IVF, and mode state round-trip
through one compressed npz.
"""

from __future__ import annotations

import pathlib

import jax.numpy as jnp
import numpy as np

from .frame import Mode


CHECKPOINT_VERSION = 2


def save_state(path, slam) -> None:
    """Serialise a SLAM engine's map state to <path> (npz)."""
    kf = slam.keyframes
    g = slam.graph
    g.resolve_pending_verdicts()  # speculative gate: land verdicts first
    n = len(kf)
    E = g.n_edges
    arrays = dict(
        version=np.asarray(CHECKPOINT_VERSION),
        mode=np.asarray(int(slam.mode)),
        img_hw=np.asarray(slam.img_hw),
        # keyframes (only the filled slots)
        kf_frame_id=kf.frame_id[:n],
        kf_T_WC=np.asarray(kf.T_WC[:n]),
        kf_n_fused=np.asarray(kf.n_fused[:n]),
        kf_n_updates=np.asarray(kf.n_updates[:n]),
        kf_score=np.asarray(kf.score[:n]),
        # factor graph
        edge_ii=g.ii[:E],
        edge_jj=g.jj[:E],
        edge_idx_ii2jj=np.asarray(g.idx_ii2jj[:E]),
        edge_idx_jj2ii=np.asarray(g.idx_jj2ii[:E]),
        edge_valid_j=np.asarray(g.valid_match_j[:E]),
        edge_valid_i=np.asarray(g.valid_match_i[:E]),
        edge_Q_ii2jj=np.asarray(g.Q_ii2jj[:E]),
        edge_Q_jj2ii=np.asarray(g.Q_jj2ii[:E]),
        edge_live=g.edge_live[:E],
    )
    # paged rows: read per keyframe, resident or evicted (identity slicing
    # only holds without paging — frame.py Keyframes paging)
    if n > 0:
        pm = [kf.pointmap_np(i) for i in range(n)]
        ft = [kf.feat_np(i) for i in range(n)]
        arrays.update(
            kf_X=np.stack([p[0] for p in pm]),
            kf_C=np.stack([p[1] for p in pm]),
            kf_feat=np.stack([f[0] for f in ft]),
            kf_pos=np.stack([f[1] for f in ft]),
        )
    else:
        arrays.update(
            kf_X=np.zeros((0,) + kf.X.shape[1:], np.float32),
            kf_C=np.zeros((0,) + kf.C.shape[1:], np.float32),
            kf_feat=np.zeros((0,) + kf.feat.shape[1:], np.float32),
            kf_pos=np.zeros((0,) + kf.pos.shape[1:], np.int32),
        )
    if kf.K is not None:
        arrays["K"] = np.asarray(kf.K)
    uimgs = [u for u in kf.uimgs[:n]]
    if all(u is not None for u in uimgs) and n > 0:
        arrays["kf_uimg"] = np.stack(uimgs)
    # retrieval IVF + counters — required so a resumed session can still
    # loop-close / relocalise against pre-checkpoint keyframes.  The head
    # params and codebook are model weights, reloaded at construction.
    rdb = getattr(slam, "retrieval", None)
    if rdb is not None:
        # format-stable flat entry rows regardless of the device layout
        # (the bucketed IVF flattens on save, rebuilds buckets on load)
        vecs, word_ids, image_ids = rdb.ivf.entries()
        arrays.update(
            ivf_vecs=vecs,
            ivf_word_ids=word_ids,
            ivf_image_ids=image_ids,
            ivf_norm_factor=np.asarray(rdb.ivf.norm_factor),
            ivf_n_images=np.asarray(rdb.ivf.n_images),
            retrieval_kf_counter=np.asarray(rdb.kf_counter),
        )
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_state(path, slam) -> None:
    """Restore a checkpoint into an engine built with compatible shapes."""
    data = np.load(path, allow_pickle=False)
    assert int(data["version"]) <= CHECKPOINT_VERSION
    assert tuple(data["img_hw"]) == tuple(slam.img_hw), "image size mismatch"

    kf = slam.keyframes
    g = slam.graph
    n = len(data["kf_frame_id"])
    E = len(data["edge_ii"])
    kf._ensure_capacity(n)
    g._ensure_capacity(E)

    kf.n = n
    kf.frame_id[:n] = data["kf_frame_id"]
    kf.T_WC = kf.T_WC.at[:n].set(jnp.asarray(data["kf_T_WC"]))
    kf.n_fused = kf.n_fused.at[:n].set(jnp.asarray(data["kf_n_fused"]))
    if "kf_n_updates" in data:
        kf.n_updates = kf.n_updates.at[:n].set(jnp.asarray(data["kf_n_updates"]))
        kf.score = kf.score.at[:n].set(jnp.asarray(data["kf_score"]))
    else:  # v1 checkpoints predate fusion-state threading
        kf.n_updates = kf.n_updates.at[:n].set(jnp.asarray(data["kf_n_fused"]))
    # paged rows: the NEWEST keyframes (the tracker and solve window need
    # them resident) come back in device slots; older overflow restores as
    # host copies and re-materialises on demand.  Without paging m == n
    # and the slot mapping is identity.
    m = min(n, kf.dcap)
    first = n - m
    kf.X = kf.X.at[:m].set(jnp.asarray(data["kf_X"][first:n]))
    kf.C = kf.C.at[:m].set(jnp.asarray(data["kf_C"][first:n]))
    kf.feat = kf.feat.at[:m].set(jnp.asarray(data["kf_feat"][first:n]))
    kf.pos = kf.pos.at[:m].set(jnp.asarray(data["kf_pos"][first:n]))
    kf.slot_of[:] = -1
    kf.slot_of[first:n] = np.arange(m, dtype=np.int32)
    kf._slot_owner[:] = -1
    kf._slot_owner[:m] = np.arange(first, n, dtype=np.int32)
    kf._free_slots = set(range(m, kf.dcap))
    kf._host_rows.clear()
    for i in range(first):
        kf._host_rows[i] = dict(
            X=np.asarray(data["kf_X"][i]),
            C=np.asarray(data["kf_C"][i]),
            feat=np.asarray(data["kf_feat"][i]),
            pos=np.asarray(data["kf_pos"][i]),
            ver=int(kf.pm_version[i]),
        )
    if "K" in data:
        kf.K = jnp.asarray(data["K"])
    if "kf_uimg" in data:
        for i in range(n):
            kf.uimgs[i] = data["kf_uimg"][i]

    g.n_edges = E
    g.ii[:E] = data["edge_ii"]
    g.jj[:E] = data["edge_jj"]
    g.idx_ii2jj = g.idx_ii2jj.at[:E].set(jnp.asarray(data["edge_idx_ii2jj"]))
    g.idx_jj2ii = g.idx_jj2ii.at[:E].set(jnp.asarray(data["edge_idx_jj2ii"]))
    g.valid_match_j = g.valid_match_j.at[:E].set(jnp.asarray(data["edge_valid_j"]))
    g.valid_match_i = g.valid_match_i.at[:E].set(jnp.asarray(data["edge_valid_i"]))
    g.Q_ii2jj = g.Q_ii2jj.at[:E].set(jnp.asarray(data["edge_Q_ii2jj"]))
    g.Q_jj2ii = g.Q_jj2ii.at[:E].set(jnp.asarray(data["edge_Q_jj2ii"]))
    if "edge_live" in data:  # v2 checkpoints predate speculative gating
        g.edge_live[:E] = data["edge_live"]

    rdb = getattr(slam, "retrieval", None)
    if rdb is not None and "ivf_vecs" in data:
        rdb.ivf.load_entries(
            data["ivf_vecs"],
            data["ivf_word_ids"],
            data["ivf_image_ids"],
            data["ivf_norm_factor"],
            int(data["ivf_n_images"]),
        )
        rdb.kf_counter = int(data["retrieval_kf_counter"])

    slam.mode = Mode(int(data["mode"]))
