"""Incremental loop-closure retrieval database.

Capability mirror of /root/reference/mast3r_slam/retrieval_database.py: per
keyframe, extract top-k attention features from the backbone tokens, query
the ASMK inverted file for loop-closure candidates, then (optionally) add the
keyframe.  All heavy math (whiten/project/quantize/hamming scoring) runs on
device; only the final top-k candidate list returns to the host.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .asmk import (
    ASMKSettings,
    DeviceIVF,
    aggregate_residuals,
    binarize_pack,
    quantize,
)
from .head import RetrievalHeadSettings, extract_topk_features, init_head_params


class RetrievalDatabase:
    def __init__(
        self,
        head_params,
        centroids,
        head_settings: RetrievalHeadSettings = RetrievalHeadSettings(),
        asmk_settings: Optional[ASMKSettings] = None,
    ):
        self.head_params = head_params
        self.centroids = jnp.asarray(centroids, dtype=jnp.float32)
        self.hs = head_settings
        dim = int(self.centroids.shape[1])
        if asmk_settings is None:
            asmk_settings = ASMKSettings(capacity=512 * head_settings.nfeat)
        self.s = asmk_settings
        self.ivf = DeviceIVF(dim, asmk_settings)
        self.kf_counter = 0

    # ------------------------------------------------------------------

    @classmethod
    def random_init(cls, key, backbone_dim: int, proj_dim: int = 64,
                    num_centroids: int = 1024, nfeat: int = 64):
        """Training-free fallback (tests / no-checkpoint runs): random
        projector + k-means-free random codebook."""
        k1, k2 = jax.random.split(key)
        params = init_head_params(k1, backbone_dim, hdims=(proj_dim,))
        centroids = jax.random.normal(k2, (num_centroids, proj_dim)) * 0.05
        hs = RetrievalHeadSettings(nfeat=nfeat)
        return cls(params, centroids, hs,
                   ASMKSettings(capacity=512 * nfeat))

    @classmethod
    def from_torch_checkpoint(cls, model_path: str, codebook_path: str,
                              nfeat: int = 300):
        """Load the reference retrieval checkpoint + codebook pickle
        (processor.py:65-100)."""
        import pickle

        import torch

        from .head import convert_torch_retrieval_head

        ckpt = torch.load(model_path, map_location="cpu", weights_only=False)
        params = convert_torch_retrieval_head(ckpt["model"])
        with open(codebook_path, "rb") as f:
            cdb = pickle.load(f)
        centroids = np.asarray(
            cdb["state"]["centroids"] if isinstance(cdb, dict) else cdb.centroids
        )
        args = ckpt.get("args")
        if args is not None and hasattr(args, "nfeat"):
            nfeat = int(args.nfeat)
        return cls(params, centroids, RetrievalHeadSettings(nfeat=nfeat))

    # ------------------------------------------------------------------

    def _features(self, feat) -> jnp.ndarray:
        """Backbone tokens (1, N, D) -> (nfeat, dim) selected features."""
        sel = extract_topk_features(self.head_params, feat, self.hs)
        return sel[0]

    def query(self, frame, k: int, min_thresh: float = 0.0,
              with_scores: bool = False):
        """Query the IVF for loop-closure candidates.

        Returns (inds, precomputed) where `precomputed` is the (features,
        quantized codes) pair — pass it to :meth:`add` to store the same
        frame without re-extracting/re-quantizing (the reloc path queries
        first and adds only on success, main.py:33-57).  With
        ``with_scores=True`` additionally returns the full per-image score
        vector (diagnostics / the reference-asmk parity oracle).
        """
        feats = self._features(frame.feat)
        m = feats.shape[0]

        # query with multiple-assignment ma_query
        inds: List[int] = []
        scores_np = np.zeros((0,), np.float32)
        q_codes = quantize(feats, self.centroids, self.s.ma_query)
        if self.kf_counter > 0:
            agg, words, valid = aggregate_residuals(
                feats, q_codes, self.centroids, m * self.s.ma_query
            )
            packed = binarize_pack(agg)
            scores = self.ivf.search(packed, words, valid)
            scores_np = np.asarray(scores)[: self.ivf.n_images]
            kk = min(k, self.ivf.n_images)
            top = np.argsort(-scores_np)[:kk]
            inds = [int(i) for i in top if scores_np[i] > min_thresh]
        if with_scores:
            return inds, (feats, q_codes), scores_np
        return inds, (feats, q_codes)

    def update(self, frame, add_after_query: bool, k: int,
               min_thresh: float = 0.0, kf_index: Optional[int] = None
               ) -> List[int]:
        """Query (if non-empty) then optionally add (retrieval_database.py:43-71).

        `kf_index` is the id the added image is stored under (pass the
        keyframe index so results are keyframe indices even when adds happen
        out of append order, e.g. async reloc); defaults to a running counter.
        Returns ids of the top-k matching database images above thresh.
        """
        inds, pre = self.query(frame, k, min_thresh)
        if add_after_query:
            self.add(frame, precomputed=pre, kf_index=kf_index)
        return inds

    def add(self, frame, precomputed=None, kf_index: Optional[int] = None):
        """Aggregate with ma_build(=1) assignments and append to the IVF."""
        if precomputed is None:
            feats = self._features(frame.feat)
            codes = quantize(feats, self.centroids, self.s.ma_query)
        else:
            feats, codes = precomputed
        build_codes = codes[:, : self.s.ma_build]
        agg, words, valid = aggregate_residuals(
            feats, build_codes, self.centroids, feats.shape[0] * self.s.ma_build
        )
        packed = binarize_pack(agg)
        self.ivf.add(packed, words, valid,
                     imid=self.kf_counter if kf_index is None else kf_index)
        self.kf_counter += 1
