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
# device-resident inverted file
# ---------------------------------------------------------------------------

class DeviceIVF:
    """Fixed-capacity flat IVF (replaces inverted_file.py grow-arrays)."""

    def __init__(self, dim: int, settings: ASMKSettings):
        self.dim = dim
        self.words = dim // 32 + (1 if dim % 32 else 0)
        self.s = settings
        cap = settings.capacity
        self.vecs = jnp.zeros((cap, self.words), dtype=jnp.uint32)
        self.word_ids = jnp.full((cap,), -1, dtype=jnp.int32)
        self.image_ids = jnp.full((cap,), -1, dtype=jnp.int32)
        self.norm_factor = jnp.zeros((settings.max_images,), dtype=jnp.float32)
        self.n_entries = 0
        self.n_images = 0

    def add(self, agg_packed, words, valid, imid=None):
        """Append one image's aggregated word vectors under image id `imid`.

        agg_packed (m, words) uint32; words (m,); valid (m,) bool.
        `imid` is the CALLER'S id (the SLAM layer passes the keyframe index,
        so search scores are keyframe-indexed directly — insertion order and
        keyframe order need not agree, e.g. async reloc).  Always writes the
        full m-row block (invalid rows keep word_id -1 and never match) so
        every add has an identical static shape.
        """
        m = agg_packed.shape[0]
        self._ensure_capacity(self.n_entries + m, imid)
        if imid is None:
            imid = self.n_images
        assert imid < self.s.max_images
        sl = slice(self.n_entries, self.n_entries + m)
        self.vecs = self.vecs.at[sl].set(agg_packed)
        self.word_ids = self.word_ids.at[sl].set(jnp.where(valid, words, -1))
        self.image_ids = self.image_ids.at[sl].set(
            jnp.where(valid, imid, -1)
        )
        self.norm_factor = self.norm_factor.at[imid].set(
            jnp.sum(valid.astype(jnp.float32))
        )
        self.n_entries += m
        self.n_images = max(self.n_images, imid + 1)

    def _ensure_capacity(self, needed_entries: int, imid=None):
        """Overflow policy: the flat entry array and the per-image norm table
        double (pow2 — the jitted search recompiles once per doubling) instead
        of asserting; long-video ingest can exceed the initial 512-keyframe
        sizing (cf. the reference's fixed grow-lists, inverted_file.py:40-53).
        """
        s = self.s
        cap = s.capacity
        while cap < needed_entries:
            cap *= 2
        if cap != s.capacity:
            pad = cap - s.capacity
            self.vecs = jnp.pad(self.vecs, ((0, pad), (0, 0)))
            self.word_ids = jnp.pad(self.word_ids, (0, pad), constant_values=-1)
            self.image_ids = jnp.pad(self.image_ids, (0, pad), constant_values=-1)
            s = s._replace(capacity=cap)
        need_img = (imid + 1) if imid is not None else (self.n_images + 1)
        mi = s.max_images
        while mi < need_img:
            mi *= 2
        if mi != s.max_images:
            self.norm_factor = jnp.pad(
                self.norm_factor, (0, mi - s.max_images)
            )
            s = s._replace(max_images=mi)
        self.s = s

    def search(self, agg_packed, q_words, q_valid):
        """Score all images against one query (inverted_file.py:86-107).

        Returns scores (max_images,) — entries beyond n_images are 0.
        """
        return _ivf_search(
            self.vecs,
            self.word_ids,
            self.image_ids,
            self.norm_factor,
            agg_packed,
            q_words,
            q_valid,
            self.dim,
            self.s.alpha,
            self.s.similarity_threshold,
            self.s.max_images,
        )


@partial(jax.jit, static_argnames=("dim", "max_images"))
def _ivf_search(
    vecs, word_ids, image_ids, norm_factor, q_vecs, q_words, q_valid,
    dim: int, alpha, sim_thresh, max_images: int,
):
    """Dense masked IVF scoring: for every (query word, entry) pair with
    matching word id, add idf-free kernel similarity to the entry's image."""

    def score_one(qv, qw, qvalid):
        match = (word_ids == qw) & qvalid  # (cap,)
        sim = hamming_sim(qv, vecs, dim)
        sim = jnp.where(match & (sim >= sim_thresh), jnp.power(sim, alpha), 0.0)
        sim = sim / jnp.sqrt(jnp.maximum(norm_factor[jnp.maximum(image_ids, 0)], 1.0))
        return jnp.zeros((max_images,), jnp.float32).at[
            jnp.maximum(image_ids, 0)
        ].add(jnp.where(match, sim, 0.0))

    scores = jax.lax.map(
        lambda args: score_one(*args), (q_vecs, q_words, q_valid), batch_size=32
    )
    q_norm = jnp.sqrt(jnp.maximum(jnp.sum(q_valid.astype(jnp.float32)), 1.0))
    return jnp.sum(scores, axis=0) / q_norm
