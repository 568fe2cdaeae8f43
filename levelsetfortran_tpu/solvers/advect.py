"""Surface-node advection onto the (smoothed) zero level set.

Re-expresses reference ``set3d.f90:470-501``: order-8 gradients on the
stencil band, then iteratively move each node with ``phi_surf > eps`` by
``phi_surf * (-grad/|grad|)`` — i.e. walk distance-phi along the inward
normal — re-sampling after each move.

The reference's loop is sequential per node and re-interpolates *all* nodes
after *each* single-node move (O(iter * n^2); ``set3d.f90:491-501``).  But
phi and grad-phi are frozen during advection, so each node's trajectory
depends only on its own position: the per-node Gauss–Seidel sweep is exactly
equivalent to a vmapped Jacobi iteration over all nodes — which is what this
module does, at O(iter * n) with batched gathers.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..grid.grid import Grid3D
from ..ops.band import narrow_band
from ..ops.derivs import first_derivative
from ..ops.interp import sample_surface


class AdvectResult(NamedTuple):
    positions: jnp.ndarray      # (n_nodes, 3) advected coordinates
    phi_surf: jnp.ndarray       # residual phi at the final positions


def banded_gradient(phi: jnp.ndarray, dx, *, order: int = 8,
                    stencil_radius: float = 8.1,
                    quirk_deriv8_y: bool = False) -> jnp.ndarray:
    """Order-``order`` gradient, zeroed outside the stencil band
    (set3d.f90:470-479: gradPhi starts 0 and is only filled where phiSB)."""
    grad, _ = first_derivative(phi, dx, order=order,
                               quirk_deriv8_y=quirk_deriv8_y)
    _, sb = narrow_band(phi, dx, stencil_radius, stencil_radius)
    return jnp.where(sb[..., None], grad, 0.0)


@partial(jax.jit, static_argnames=("iters", "grid", "order",
                                   "quirk_deriv8_y"))
def advect_nodes(phi: jnp.ndarray, grid: Grid3D, positions: jnp.ndarray,
                 dx, iters: int = 1000, *, eps: float = 1e-13,
                 order: int = 8, stencil_radius: float = 8.1,
                 quirk_deriv8_y: bool = False) -> AdvectResult:
    """Move nodes onto the zero level set (vectorized set3d.f90:489-501).

    Only nodes with ``phi_surf > eps`` move each iteration, matching the
    reference's one-sided gate (``set3d.f90:493``: nodes on the negative side
    never move).
    """
    grad = banded_gradient(phi, dx, order=order,
                           stencil_radius=stencil_radius,
                           quirk_deriv8_y=quirk_deriv8_y)

    def step(_, x):
        p, direction = sample_surface(phi, grad, grid, x)
        move = (p > eps).astype(x.dtype)
        return x + (move * p)[:, None] * direction

    final = jax.lax.fori_loop(0, iters, step, positions)
    p_final, _ = sample_surface(phi, grad, grid, final)
    return AdvectResult(positions=final, phi_surf=p_final)
