"""Smeared sign function.

Reference: ``subs.f90:152-172`` (``phiSign``).  The smeared variant is
``sgn = pS / sqrt(pS^2 + dx^2 * gM)`` — note ``gM`` enters *unsquared* as
written (``subs.f90:169``); the commented-out hard sign is also provided.
The unsquared gM is kept deliberately: it shapes the converged reinit field
(SURVEY.md §2 row 4), and for gM ~ 1 (eikonal steady state) it coincides with
the standard smearing.
"""

from __future__ import annotations

import jax.numpy as jnp


def smeared_sign(ps: jnp.ndarray, dx, grad_mag) -> jnp.ndarray:
    """``pS / sqrt(pS^2 + dx^2 * gM)`` (subs.f90:169).

    The denominator is floored at a tiny normal number so the degenerate
    point (ps = 0 and gM = 0, where the reference would emit NaN) yields 0
    with a finite gradient instead.
    """
    denom = jnp.sqrt(ps * ps + dx * dx * grad_mag)
    return ps / jnp.maximum(denom, jnp.asarray(1e-30, denom.dtype))


def hard_sign(ps: jnp.ndarray) -> jnp.ndarray:
    """Non-smeared sign (the commented-out branch, subs.f90:160-166)."""
    return jnp.sign(ps)
