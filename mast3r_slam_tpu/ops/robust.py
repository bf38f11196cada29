"""Robust NLLS weight functions (reference: nonlinear_optimizer.py:28-42)."""

from __future__ import annotations

import jax.numpy as jnp


def huber_weight(r, k: float = 1.345):
    """IRLS weight for the Huber loss: 1 inside |r|<k, k/|r| outside."""
    r_abs = jnp.abs(r)
    r_safe = jnp.where(r_abs < k, k, r_abs)
    return jnp.where(r_abs < k, 1.0, k / r_safe)


def tukey_weight(r, t: float = 4.6851):
    """IRLS weight for the Tukey biweight: (1-(r/t)^2)^2 inside, 0 outside."""
    r_abs = jnp.abs(r)
    tmp = 1.0 - jnp.square(r_abs / t)
    return jnp.where(r_abs < t, tmp * tmp, 0.0)
