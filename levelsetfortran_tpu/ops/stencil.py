"""Shift/stencil helpers shared by all grid operators.

The reference expresses every stencil as scalar indexing ``phi(i+o, j, k)``
inside triple loops (e.g. ``subs.f90:506-644``).  The TPU-native equivalent is
whole-array shifted views that XLA fuses into a single vectorized stencil
pass; no scalar loops exist anywhere in this package.
"""

from __future__ import annotations

import jax.numpy as jnp


def shift(a: jnp.ndarray, axis: int, off: int) -> jnp.ndarray:
    """``shift(a, axis, off)[i] == a[i + off]`` along ``axis``.

    Implemented with a circular roll: the wrapped lanes are only ever read by
    stencil branches that are masked out near boundaries (interior-only
    updates / deep-interior WENO selection), mirroring the reference's
    loop-bound guards (``subs.f90:506``, ``subs.f90:744-746``).
    """
    if off == 0:
        return a
    return jnp.roll(a, -off, axis=axis)


def interior_mask(shape, depth: int, dtype=bool) -> jnp.ndarray:
    """Mask of cells at least ``depth`` points away from every face.

    ``depth=1`` reproduces the reference's update region ``1..n-1``
    (``subs.f90:744-746``); ``depth=4`` reproduces the deep-interior WENO
    region ``i>3 .AND. i<n-4`` (``subs.f90:506``).
    """
    masks = []
    for ax, n in enumerate(shape):
        idx = jnp.arange(n)
        m = (idx >= depth) & (idx <= n - 1 - depth)
        bshape = [1, 1, 1]
        bshape[ax] = n
        masks.append(m.reshape(bshape))
    return (masks[0] & masks[1] & masks[2]).astype(dtype)


def boundary_extrapolate(phi: jnp.ndarray, dx) -> jnp.ndarray:
    """Ghost-layer extrapolation BC: every boundary point becomes its nearest
    interior point (diagonal for edges/corners) plus ``dx``.

    This is the intended semantics of the reference BC block
    (``subs.f90:858-897``: faces/edges/corners = inner neighbor + dx); the
    reference's redundant triple-loop re-execution of those assignments
    (SURVEY.md §2 quirk 8) is dropped as waste, and overwrite-order artifacts
    on the outermost layer are replaced by the clean clamped-index rule.
    """
    inner = phi[1:-1, 1:-1, 1:-1]
    out = jnp.pad(inner, 1, mode="edge")
    bmask = ~interior_mask(phi.shape, 1)
    return jnp.where(bmask, out + dx, phi)
