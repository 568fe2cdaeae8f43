"""Halo exchange over the device mesh (inside ``shard_map``).

The stencil ops need up to radius-4 neighbor data (WENO5: 3; order-8
derivatives: 4 — SURVEY.md §5).  Each sharded step first exchanges
``width``-cell halos with face neighbors along every mesh axis using
``jax.lax.ppermute`` — XLA lowers this to ICI collective-permute on TPU.

Exchanging axes *sequentially on the already-padded array* also fills
edge/corner halos (the standard dimension-splitting trick), so mixed
derivatives see correct diagonal neighbors.

Shards on a global boundary have no neighbor: ppermute leaves their halo
zero-filled, which is harmless because (a) the global deep-interior /
update masks exclude any cell whose stencil would touch those lanes, and
(b) ghost values at the global boundary are overwritten by the
extrapolation BC each step.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .mesh import AXIS_NAMES


def _axis_slab(x: jnp.ndarray, axis: int, start: int, size: int):
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(start, start + size) if start >= 0 else slice(start, None)
    return x[tuple(idx)]


def halo_exchange_axis(x: jnp.ndarray, width: int, axis: int,
                       axis_name: str, n_shards: int,
                       periodic: bool = False) -> jnp.ndarray:
    """Extend ``x`` by ``width`` cells on both sides of ``axis`` with
    neighbor data.

    Global-boundary halos are zero-filled by default (solver masks/BCs
    never read them).  ``periodic=True`` wraps them from the opposite end
    of the GLOBAL grid instead — a ring permutation — which makes sharded
    stencils bitwise-match the single-device ops' circular ``jnp.roll``
    semantics even at global faces (used by the sharded advection
    gradient, whose single-device counterpart has no boundary masking)."""
    if n_shards == 1:
        if periodic:
            left = _axis_slab(x, axis, -width, width)
            right = _axis_slab(x, axis, 0, width)
            return jnp.concatenate([left, x, right], axis=axis)
        zero = jnp.zeros_like(_axis_slab(x, axis, 0, width))
        return jnp.concatenate([zero, x, zero], axis=axis)
    if periodic:
        fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        bwd = [((i + 1) % n_shards, i) for i in range(n_shards)]
    else:
        fwd = [(i, i + 1) for i in range(n_shards - 1)]   # data flows +axis
        bwd = [(i + 1, i) for i in range(n_shards - 1)]   # data flows -axis
    # my last `width` cells become my +1 neighbor's left halo
    from_left = jax.lax.ppermute(_axis_slab(x, axis, -width, width),
                                 axis_name, fwd)
    # my first `width` cells become my -1 neighbor's right halo
    from_right = jax.lax.ppermute(_axis_slab(x, axis, 0, width),
                                  axis_name, bwd)
    return jnp.concatenate([from_left, x, from_right], axis=axis)


def halo_exchange(x: jnp.ndarray, width,
                  mesh_shape: Sequence[int],
                  axis_names: Sequence[str] = AXIS_NAMES,
                  periodic: bool = False) -> jnp.ndarray:
    """Pad a local block with halos along all three axes.

    ``width`` may be a single int or a per-axis tuple (0 skips an axis —
    used when that axis is unsharded and handled in-kernel).  Must be
    called inside ``shard_map`` with the named axes live.  The sequential
    per-axis exchange fills corner/edge halos correctly.
    """
    widths = ((width,) * 3 if isinstance(width, int) else tuple(width))
    for axis, (name, n, w) in enumerate(zip(axis_names, mesh_shape,
                                            widths)):
        if w:
            x = halo_exchange_axis(x, w, axis, name, n, periodic=periodic)
    return x


def refresh_halos(pad: jnp.ndarray, width, mesh_shape: Sequence[int],
                  axis_names: Sequence[str] = AXIS_NAMES) -> jnp.ndarray:
    """Refresh the apron frame of a PERSISTENTLY padded block in place
    (functionally): per axis, ``ppermute`` the block's owned face slabs and
    write them into the aprons with aligned updates — the carried solver
    state stays in the kernel's padded layout for the whole solve instead
    of being concat-rebuilt every step (VERDICT r3 weak #5; the repo's
    single-chip persistent-layout principle applied across shards).

    Equivalent to re-running :func:`halo_exchange` on the cropped block:
    axes are refreshed sequentially and a later axis's slabs span the full
    extent of earlier axes (aprons included, just refreshed), so
    edge/corner aprons receive diagonal-neighbor data.  The sent slabs are
    always OWNED cells ([w, 2w) and [size-2w, size-w) of a (2w + owned)
    layout), so the refresh is sound even when the apron/extension region
    of the carry holds stale or unwritten data (halo-deep pipelining).
    Global-boundary aprons become zeros (ppermute non-participants),
    matching halo_exchange; solver masks/BCs never read them.
    """
    widths = ((width,) * 3 if isinstance(width, int) else tuple(width))
    for axis, (name, n, w) in enumerate(zip(axis_names, mesh_shape,
                                            widths)):
        if not w:
            continue
        size = pad.shape[axis]

        def slab(start):
            idx = [slice(None)] * pad.ndim
            idx[axis] = slice(start, start + w)
            return pad[tuple(idx)]

        if n == 1:
            from_left = jnp.zeros_like(slab(0))
            from_right = from_left
        else:
            fwd = [(i, i + 1) for i in range(n - 1)]
            bwd = [(i + 1, i) for i in range(n - 1)]
            from_left = jax.lax.ppermute(slab(size - 2 * w), name, fwd)
            from_right = jax.lax.ppermute(slab(w), name, bwd)
        li = [slice(None)] * pad.ndim
        li[axis] = slice(0, w)
        ri = [slice(None)] * pad.ndim
        ri[axis] = slice(size - w, size)
        pad = pad.at[tuple(li)].set(from_left).at[tuple(ri)].set(from_right)
    return pad


def halo_exchange_axis_transpose(cot: jnp.ndarray, width: int, axis: int,
                                 axis_name: str, n_shards: int
                                 ) -> jnp.ndarray:
    """Linear transpose of :func:`halo_exchange_axis` (non-periodic).

    Forward: ``y = concat([L, x, R])`` with ``L = ppermute(x[-w:], fwd)``,
    ``R = ppermute(x[:w], bwd)``.  Transpose: the center slab passes
    through; my LEFT-halo cotangent returns to my -1 neighbor's last
    ``w`` cells (``ppermute`` with the inverted permutation), my
    RIGHT-halo cotangent to my +1 neighbor's first ``w`` cells.  Edge
    shards' outward halos were zero-filled in the forward, and their
    cotangent is correspondingly dropped here (no pair sends it).
    """
    cot_L = _axis_slab(cot, axis, 0, width)
    cot_R = _axis_slab(cot, axis, -width, width)
    mid = [slice(None)] * cot.ndim
    mid[axis] = slice(width, cot.shape[axis] - width)
    out = cot[tuple(mid)]
    if n_shards == 1:
        return out
    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i + 1, i) for i in range(n_shards - 1)]
    to_last = jax.lax.ppermute(cot_L, axis_name, bwd)   # inverse of fwd
    to_first = jax.lax.ppermute(cot_R, axis_name, fwd)  # inverse of bwd
    last = [slice(None)] * cot.ndim
    last[axis] = slice(out.shape[axis] - width, out.shape[axis])
    first = [slice(None)] * cot.ndim
    first[axis] = slice(0, width)
    out = out.at[tuple(last)].add(to_last)
    return out.at[tuple(first)].add(to_first)


def halo_exchange_transpose(cot: jnp.ndarray, width,
                            mesh_shape: Sequence[int],
                            axis_names: Sequence[str] = AXIS_NAMES
                            ) -> jnp.ndarray:
    """Transpose of :func:`halo_exchange`: fold a padded-block cotangent
    back onto local blocks — apron cotangents (contributions to NEIGHBOR
    shards' cells, e.g. from the adjoint kernel's window scatter) ride the
    reverse ppermute and accumulate into the neighbors' face cells.

    The forward exchanges axes sequentially on the progressively padded
    array, so the transpose peels them in REVERSE axis order.
    """
    widths = ((width,) * 3 if isinstance(width, int) else tuple(width))
    for axis in reversed(range(len(widths))):
        if widths[axis]:
            cot = halo_exchange_axis_transpose(
                cot, widths[axis], axis, axis_names[axis],
                mesh_shape[axis])
    return cot


def crop(x: jnp.ndarray, width: int) -> jnp.ndarray:
    """Inverse of :func:`halo_exchange`: drop the halo frame."""
    sl = tuple(slice(width, -width) for _ in range(3))
    return x[sl]


def local_offsets(mesh_shape: Sequence[int], block_shape: Sequence[int],
                  axis_names: Sequence[str] = AXIS_NAMES):
    """Global index offset of this shard's block origin (traced values)."""
    return tuple(
        jax.lax.axis_index(name) * b
        for name, b in zip(axis_names, block_shape))
