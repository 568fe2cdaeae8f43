"""Central finite-difference first/second derivatives (orders 1-8).

Re-expresses reference ``subs.f90:213-364`` (``firstDeriv``) and
``subs.f90:370-407`` (``secondDeriv``) as whole-grid vectorized operators.
The reference's order-8 y-stencil typo (``subs.f90:346``: ``jp1`` where
``jp2`` belongs) and order-1 plus-sign bug (``subs.f90:227,233,239``) are
fixed by default, reproducible via ``QuirkConfig``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .stencil import shift

# Antisymmetric central-difference coefficients for offsets 1..r
_CENTRAL_COEFFS = {
    2: (1.0 / 2.0,),
    4: (8.0 / 12.0, -1.0 / 12.0),
    6: (3.0 / 4.0, -3.0 / 20.0, 1.0 / 60.0),
    8: (4.0 / 5.0, -1.0 / 5.0, 4.0 / 105.0, -1.0 / 280.0),
}


def _central_axis(phi, axis, dx, order):
    coeffs = _CENTRAL_COEFFS[order]
    out = jnp.zeros_like(phi)
    for r, c in enumerate(coeffs, start=1):
        out = out + c * (shift(phi, axis, r) - shift(phi, axis, -r))
    return out / dx


def _order8_y_quirk(phi, dx):
    """Reference-as-written order-8 y derivative (subs.f90:345-346):
    the +2 tap reads offset +1 instead, breaking antisymmetry."""
    c = [1.0 / 280.0, -4.0 / 105.0, 1.0 / 5.0, -4.0 / 5.0,
         4.0 / 5.0, -1.0 / 5.0, 4.0 / 105.0, -1.0 / 280.0]
    s = lambda o: shift(phi, 1, o)
    return (c[0] * s(-4) + c[1] * s(-3) + c[2] * s(-2) + c[3] * s(-1)
            + c[4] * s(1) + c[5] * s(1) + c[6] * s(3) + c[7] * s(4)) / dx


def _order1_axis(phi, axis, dx, plus_sign_quirk=False):
    """'Order 1' upwind-flavored branch (subs.f90:224-242): if the forward
    neighbor is larger use the forward pair, else backward difference."""
    fwd_larger = shift(phi, axis, 1) > phi
    if plus_sign_quirk:
        fwd = (phi + shift(phi, axis, 1)) / dx   # reference-as-written
    else:
        fwd = (shift(phi, axis, 1) - phi) / dx   # intended math
    bwd = (phi - shift(phi, axis, -1)) / dx
    return jnp.where(fwd_larger, fwd, bwd)


def first_derivative(phi: jnp.ndarray, dx, order: int = 2, *,
                     quirk_deriv8_y: bool = False,
                     quirk_deriv1_plus: bool = False):
    """Gradient components (phiX, phiY, phiZ) stacked on the last axis, plus
    the gradient magnitude — the vectorized ``firstDeriv``.
    """
    if order == 1:
        comps = [_order1_axis(phi, a, dx, quirk_deriv1_plus) for a in range(3)]
    elif order in _CENTRAL_COEFFS:
        comps = [_central_axis(phi, a, dx, order) for a in range(3)]
        if order == 8 and quirk_deriv8_y:
            comps[1] = _order8_y_quirk(phi, dx)
    else:
        raise ValueError(f"derivative order {order} not supported "
                         "(reference STOPs here too: subs.f90:352-353)")
    grad = jnp.stack(comps, axis=-1)
    mag = jnp.sqrt(comps[0] ** 2 + comps[1] ** 2 + comps[2] ** 2)
    return grad, mag


def second_derivative(phi: jnp.ndarray, dx, order: int = 2):
    """Second derivatives: ((phiXX, phiYY, phiZZ), (phiXY, phiXZ, phiYZ)).

    Second-order central stencils exactly as subs.f90:382-398; other orders
    are unsupported (the reference STOPs: subs.f90:400-403).
    """
    if order != 2:
        raise ValueError("only order-2 second derivatives are defined "
                         "(subs.f90:400-403)")
    inv_dx2 = 1.0 / (dx * dx)

    def d2(axis):
        return (shift(phi, axis, 1) - 2.0 * phi + shift(phi, axis, -1)) * inv_dx2

    def dmix(a, b):
        pp = shift(shift(phi, a, 1), b, 1)
        pm = shift(shift(phi, a, 1), b, -1)
        mp = shift(shift(phi, a, -1), b, 1)
        mm = shift(shift(phi, a, -1), b, -1)
        return (pp - pm - mp + mm) * inv_dx2 / 4.0

    pure = jnp.stack([d2(0), d2(1), d2(2)], axis=-1)
    mixed = jnp.stack([dmix(0, 1), dmix(0, 2), dmix(1, 2)], axis=-1)
    return pure, mixed


def laplacian(phi: jnp.ndarray, dx):
    """Sum of pure second derivatives (the curvature proxy of subs.f90:461)."""
    pure, _ = second_derivative(phi, dx)
    return pure.sum(axis=-1)
