"""Pallas radius-1 descriptor-refinement kernel (VERDICT r3 item 3 attempt).

The gated matcher's finest level (`ops/matching.refine_matches` at
radius=1, dilation_max=1 — the full-N stage of the speed profile) is pure
gather traffic in XLA: it builds a 9F-wide window table (9 shifted copies
of the descriptor image through HBM) and gathers N rows of it (~36 B/px
int8 rows, row-billed at ~8 ns).  The int8 descriptor image itself is only
H*W*F ≈ 4.7 MB at 384x512xF24 — it FITS IN VMEM.  This kernel keeps the
whole image resident in VMEM and performs the 9 candidate lookups as
in-VMEM `jnp.take` gathers, so HBM sees only the index/descriptor streams:
~N*(F+8) bytes instead of ~N*(4+36+9F) plus the table build.

OUTCOME (r4, measured — BASELINE.md "Pallas matcher attempt"): NEGATIVE.
Mosaic exposes exactly one gather lowering (the same-shape per-lane
`take_along_axis` form, jax lowering.py:_gather_lowering_rule) and that
form fails to compile through the remote service at every probed size
(scripts/tpu_r4_experiments.py gatherprobe/gatherprobe2) — in-VMEM dynamic
gather is not expressible from this toolchain, and per-row DMA costs
orders more than XLA's gather engine (measured 2.5-6.7 ns/row at full N,
~the random-HBM-transaction ceiling).  This kernel is kept interpret-mode
tested (tests/test_refine_pallas.py) as the design artifact; the XLA
phrasings in ops/matching.py remain the production path.
Reference semantics: matching_kernels.cu:26-81 with radius=1.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SCORE_MIN = jnp.iinfo(jnp.int32).min

# candidate offsets in refine_matches' k order (dy-major), so first-max-wins
# matches jnp.argmax exactly
_OFFSETS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _kernel(H: int, W: int, tab_ref, d21_ref, idx_ref, out_ref):
    # block shapes carry a leading batch dim of 1: (1, R, 128) etc.
    R = idx_ref.shape[1]
    idx = idx_ref[0]  # (R, 128) int32 linear indices
    u = idx % W
    v = idx // W
    d21 = d21_ref[0].astype(jnp.int32)  # (tile_n, F)

    best = jnp.full((R, 128), _SCORE_MIN, jnp.int32)
    bu = u
    bv = v
    HW = H * W
    for dy, dx in _OFFSETS:
        uu = u + dx
        vv = v + dy
        inside = (uu >= 0) & (uu < W) & (vv >= 0) & (vv < H)
        cidx = jnp.clip(idx + dy * W + dx, 0, HW - 1)
        rows = jnp.take(tab_ref[0], cidx.reshape(-1), axis=0)  # (tile_n, F)
        sc = jnp.sum(rows.astype(jnp.int32) * d21, axis=-1).reshape(R, 128)
        sc = jnp.where(inside, sc, _SCORE_MIN)
        upd = sc > best  # strict: first max in k order wins (= argmax)
        best = jnp.where(upd, sc, best)
        bu = jnp.where(upd, uu, bu)
        bv = jnp.where(upd, vv, bv)
    out_ref[0] = bv * W + bu


@partial(jax.jit, static_argnames=("H", "W", "tile_n", "interpret"))
def refine_r1_pallas(D11q, D21q, idx, H: int, W: int, tile_n: int = 2048,
                     interpret: bool = False):
    """Radius-1 window argmax with the descriptor image resident in VMEM.

    D11q: (B, H*W, F) int8; D21q: (B, N, F) int8; idx: (B, N) int32 current
    match linear indices.  Returns refined (B, N) int32 indices — exactly
    ``refine_matches(D11, D21, p, radius=1, dilation_max=1)`` on quantised
    descriptors.  N and tile_n must be multiples of 128.
    """
    B, HW, F = D11q.shape
    N = idx.shape[1]
    assert N % 128 == 0 and tile_n % 128 == 0
    R = tile_n // 128
    grid = (B, N // tile_n)

    idx2 = idx.reshape(B, N // 128, 128)

    out = pl.pallas_call(
        partial(_kernel, H, W),
        # NOTE: blocks keep their leading length-1 batch dim; the kernel
        # indexes through it ([0]) rather than squeezing

        out_shape=jax.ShapeDtypeStruct((B, N // 128, 128), jnp.int32),
        grid=grid,
        in_specs=[
            # whole descriptor image resident per batch row
            pl.BlockSpec((1, HW, F), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, F), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 128), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, 128), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(D11q, D21q, idx2)
    return out.reshape(B, N)


