"""TPU-safe numeric primitives.

`jnp.linalg.norm` (and `jnp.vdot`) can lower through an MXU dot on TPU,
whose DEFAULT precision truncates f32 operands to bf16 — ~1e-3 relative
noise.  In iterative solvers that is fatal, not cosmetic: the r3 global-BA
CG loop diverged on-chip from truncated alpha/beta inner products, and the
r4 pcg3 bisect showed the GN loop diverging even under exact f64 linear
solves because the EDGE-BLOCK ray normalisations carried the same noise
(BASELINE.md).  An elementwise multiply + VPU reduce is exact f32 and, per
the r3 LN A/B, also FASTER than a HIGHEST-precision dot at these widths.
"""

from __future__ import annotations

import jax.numpy as jnp


def vnorm(x, axis=-1, keepdims=True):
    """Exact-f32 L2 norm over `axis` (VPU multiply+reduce, never an MXU dot)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims))


def vnormalize(x, axis=-1, eps=None):
    """x / ||x|| with the same VPU-exact norm; optional epsilon floor."""
    n = vnorm(x, axis=axis, keepdims=True)
    if eps is not None:
        n = jnp.maximum(n, eps)
    return x / n
