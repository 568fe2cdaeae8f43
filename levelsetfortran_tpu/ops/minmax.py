"""Min/max mean-curvature-flow RHS.

Re-expresses reference ``subs.f90:413-483`` (``minMax``): the curvature proxy
is the Laplacian (the true mean-curvature expression is commented out in the
reference, ``subs.f90:426-448`` — provided here as :func:`mean_curvature` and
usable via ``use_true_curvature``), and the min/max switch compares the
7-point neighborhood average of phi against a threshold:

    F = min(curv, 0) where avg < thresh else max(curv, 0)

so positive-phi regions only ever sharpen outward and negative regions
inward — the min/max flow of Malladi & Sethian.
"""

from __future__ import annotations

import jax.numpy as jnp

from .derivs import first_derivative, second_derivative
from .stencil import shift


def seven_point_average(phi: jnp.ndarray, h: int = 1) -> jnp.ndarray:
    """Average of the cell and its 6 face neighbors at offset ``h``
    (subs.f90:473-474)."""
    total = phi
    for axis in range(3):
        total = total + shift(phi, axis, h) + shift(phi, axis, -h)
    return total / 7.0


def minmax_rhs(phi: jnp.ndarray, dx, *, threshold: float = 0.0,
               avg_halfwidth: int = 1, use_true_curvature: bool = False):
    """Flow speed F for the min/max smoothing step (subs.f90:453-481)."""
    if use_true_curvature:
        curv = mean_curvature(phi, dx)
    else:
        pure, _ = second_derivative(phi, dx)
        curv = pure.sum(axis=-1)                       # Laplacian proxy
    pave = seven_point_average(phi, avg_halfwidth)
    return jnp.where(pave < threshold,
                     jnp.minimum(curv, 0.0),
                     jnp.maximum(curv, 0.0))


def mean_curvature(phi: jnp.ndarray, dx, eps: float = 1e-13):
    """True mean curvature div(grad phi/|grad phi|) — the commented-out
    branch of the reference (subs.f90:426-448), implemented for real."""
    grad, mag = first_derivative(phi, dx, order=2)
    pure, mixed = second_derivative(phi, dx)
    gx, gy, gz = grad[..., 0], grad[..., 1], grad[..., 2]
    pxx, pyy, pzz = pure[..., 0], pure[..., 1], pure[..., 2]
    pxy, pxz, pyz = mixed[..., 0], mixed[..., 1], mixed[..., 2]
    num = ((pyy + pzz) * gx * gx + (pxx + pzz) * gy * gy
           + (pxx + pyy) * gz * gz
           - 2.0 * (gx * gy * pxy + gx * gz * pxz + gy * gz * pyz))
    denom = mag ** 3
    return jnp.where(denom < eps, 0.0, num / jnp.maximum(denom, eps))
