"""Fused Pallas TPU kernel for the min/max curvature-flow step.

Re-expresses one Euler step of the smoothing loop (``set3d.f90:394-462``
with the minMax RHS of ``subs.f90:413-483``) as a single radius-1 stencil
pass: the 6-neighbor sum feeds BOTH the Laplacian curvature proxy
(``subs.f90:453-461``) and the 7-point average switch (``subs.f90:473-481``),
so each cell costs ~15 VPU ops and one read+write of HBM — the step is
bandwidth-bound, unlike the jnp path which materializes the stacked
second-derivative fields.

Shares the persistent padded layout of :mod:`.weno_pallas` (pad once per
solve, crop once).  Boundary semantics: stencils at true domain faces read
edge-clamped apron values (the jnp path's circular rolls wrap instead);
both are irrelevant in valid use because the narrow band never touches the
faces (the grid carries a >= 10-cell far-field pad, set3d.f90:148).

Supports the default configuration (Laplacian proxy, avg_halfwidth=1);
other configurations fall back to the jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .weno_pallas import (XA, YA, _roll, crop_from_pallas,
                          pad_for_pallas, pallas_supported)


def _jnp_step(phi, dx, h1, band_radius, threshold):
    from .minmax import minmax_rhs
    from .stencil import interior_mask
    f = minmax_rhs(phi, dx, threshold=threshold, avg_halfwidth=1,
                   use_true_curvature=False)
    nb = jnp.abs(phi) < band_radius * dx
    return jnp.where(nb & interior_mask(phi.shape, 1), phi + h1 * f, phi)


def _make_kernel(gshape, tile, nzp):
    nx, ny, nz = gshape          # TRUE grid shape: bounds for global masks
    tx, ty = tile
    wx, wy = tx + 2, ty + 2 * YA

    def kernel(dx_ref, h1_ref, br_ref, th_ref, ox_ref, oy_ref,
               phi_hbm, out_hbm, slab, oslab, in_sems, out_sems):
        bi = pl.program_id(0)
        bj = pl.program_id(1)
        nby = pl.num_programs(1)
        lin = bi * nby + bj
        n_blocks = pl.num_programs(0) * nby

        def in_dma(slot, block_lin):
            wi = block_lin // nby
            wj = block_lin % nby
            return pltpu.make_async_copy(
                phi_hbm.at[pl.ds(wi * tx + XA - 1, wx),
                           pl.ds(wj * ty, wy), :],
                slab.at[slot], in_sems.at[slot])

        def out_dma(slot, block_lin):
            wi = block_lin // nby
            wj = block_lin % nby
            return pltpu.make_async_copy(
                oslab.at[slot],
                out_hbm.at[pl.ds(XA + wi * tx, tx),
                           pl.ds(YA + wj * ty, ty), :],
                out_sems.at[slot])

        @pl.when(lin == 0)
        def _():
            in_dma(0, 0).start()

        @pl.when(lin + 1 < n_blocks)
        def _():
            in_dma((lin + 1) % 2, lin + 1).start()

        in_dma(lin % 2, lin).wait()
        slot = lin % 2

        dx = dx_ref[0, 0]
        h1 = h1_ref[0, 0]
        band_radius = br_ref[0, 0]
        threshold = th_ref[0, 0]
        inv_dx2 = 1.0 / (dx * dx)

        c = slab[slot, 1:1 + tx, YA:YA + ty, :]
        sum6 = (slab[slot, 0:tx, YA:YA + ty, :]
                + slab[slot, 2:2 + tx, YA:YA + ty, :]
                + slab[slot, 1:1 + tx, YA - 1:YA - 1 + ty, :]
                + slab[slot, 1:1 + tx, YA + 1:YA + 1 + ty, :]
                + _roll(c, -1, 2) + _roll(c, 1, 2))

        lap = (sum6 - 6.0 * c) * inv_dx2
        pave = (sum6 + c) * (1.0 / 7.0)
        f = jnp.where(pave < threshold, jnp.minimum(lap, 0.0),
                      jnp.maximum(lap, 0.0))
        # update gate: narrow band AND global interior (face cells never
        # update — the only cells whose stencil touches the apron, so
        # apron garbage is provably select-discarded; see minmax_step)
        gx = (ox_ref[0, 0] + bi * tx
              + jax.lax.broadcasted_iota(jnp.int32, (tx, 1, 1), 0))
        gy = (oy_ref[0, 0] + bj * ty
              + jax.lax.broadcasted_iota(jnp.int32, (1, ty, 1), 1))
        gz = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nzp), 2)
        interior = ((gx >= 1) & (gx <= nx - 2) & (gy >= 1) & (gy <= ny - 2)
                    & (gz >= 1) & (gz <= nz - 2))
        nb = jnp.abs(c) < band_radius * dx
        res = jnp.where(nb & interior, c + h1 * f, c)

        @pl.when(lin >= 2)
        def _():
            out_dma(slot, lin - 2).wait()

        oslab[slot] = res
        out_dma(slot, lin).start()

        @pl.when(lin == n_blocks - 1)
        def _():
            @pl.when(n_blocks >= 2)
            def _():
                out_dma((lin - 1) % 2, lin - 1).wait()
            out_dma(slot, lin).wait()

    return kernel, (wx, wy)


def _pick_tile(gshape):
    _, ny, _ = gshape
    ty = 128 if ny >= 96 else max(8, -(-ny // 8) * 8)
    return 8, min(ty, 128)


@functools.partial(jax.jit, static_argnames=("gshape", "tile", "interpret"))
def minmax_step_padded(phi_pad, dx, h1, band_radius, threshold, *, gshape,
                       tile, interpret, offsets=None):
    """One min/max Euler step on a padded-layout array.

    ``offsets`` (ox, oy): this block's global origin — (0, 0) single-device,
    the shard offset under domain decomposition."""
    nx, ny, nz = gshape
    tx, ty = tile
    nxp = phi_pad.shape[0] - 2 * XA
    nyp = phi_pad.shape[1] - 2 * YA
    nzp = phi_pad.shape[2]
    if offsets is None:
        offsets = (jnp.int32(0), jnp.int32(0))
    kernel, (wx, wy) = _make_kernel(gshape, tile, nzp)
    scalar = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                          memory_space=pltpu.SMEM)
    itemsize = phi_pad.dtype.itemsize
    vmem_limit = min(100 * 1024 * 1024,
                     (2 * (wx * wy + tx * ty) + 12 * tx * ty)
                     * nzp * itemsize)
    dt = phi_pad.dtype

    def s(v):
        return jnp.reshape(jnp.asarray(v, dt), (1, 1))

    int_scalar = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                              memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(phi_pad.shape, dt),
        grid=(nxp // tx, nyp // ty),
        in_specs=[scalar, scalar, scalar, scalar, int_scalar, int_scalar,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, wx, wy, nzp), dt),
            pltpu.VMEM((2, tx, ty, nzp), dt),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=int(vmem_limit),
        ),
        interpret=interpret,
    )(s(dx), s(h1), s(band_radius), s(threshold),
      jnp.reshape(jnp.asarray(offsets[0], jnp.int32), (1, 1)),
      jnp.reshape(jnp.asarray(offsets[1], jnp.int32), (1, 1)), phi_pad)


def minmax_pallas_applicable(phi, avg_halfwidth, use_true_curvature) -> bool:
    return (avg_halfwidth == 1 and not use_true_curvature
            and pallas_supported(phi.shape, phi.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_scan(phi0, dx, h1, band_radius, threshold, steps, tile,
                interpret):
    gshape = phi0.shape
    phi_pad = pad_for_pallas(phi0, tile)

    def step(p, _):
        return minmax_step_padded(p, dx, h1, band_radius, threshold,
                                  gshape=gshape, tile=tile,
                                  interpret=interpret), None

    phi_pad, _ = jax.lax.scan(step, phi_pad, None, length=steps)
    return crop_from_pallas(phi_pad, gshape)


def _fused_scan_fwd(phi0, dx, h1, band_radius, threshold, steps, tile,
                    interpret):
    out = _fused_scan(phi0, dx, h1, band_radius, threshold, steps, tile,
                      interpret)
    return out, (phi0, dx, h1, band_radius, threshold)


def _fused_scan_bwd(steps, tile, interpret, res, g):
    phi0, dx, h1, band_radius, threshold = res

    def jnp_scan(p0, d, hh, br, th):
        def step(p, _):
            return jax.checkpoint(
                lambda q: _jnp_step(q, d, hh, br, th))(p), None
        out, _ = jax.lax.scan(step, p0, None, length=steps)
        return out

    _, vjp = jax.vjp(jnp_scan, phi0, dx, h1, band_radius, threshold)
    return vjp(g)


_fused_scan.defvjp(_fused_scan_fwd, _fused_scan_bwd)


def minmax_scan_pallas(phi0, dx, h1, steps: int, *, band_radius=4.1,
                       threshold=0.0, tile=None, interpret=None):
    """``steps`` fused min/max smoothing steps (persistent padded layout)."""
    phi0 = jnp.asarray(phi0)
    from .weno_pallas import best_axis_order, inverse_perm
    perm = best_axis_order(phi0.shape)
    if perm != (0, 1, 2):
        out = minmax_scan_pallas(jnp.transpose(phi0, perm), dx, h1, steps,
                                 band_radius=band_radius,
                                 threshold=threshold, tile=tile,
                                 interpret=interpret)
        return jnp.transpose(out, inverse_perm(perm))
    if not pallas_supported(phi0.shape, phi0.dtype):
        from ..solvers.minmax_flow import minmax_flow_fixed
        return minmax_flow_fixed(phi0, dx, h1, steps,
                                 band_radius=band_radius,
                                 threshold=threshold)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile is None:
        tile = _pick_tile(phi0.shape)
    dt = phi0.dtype
    return _fused_scan(phi0, jnp.asarray(dx, dt), jnp.asarray(h1, dt),
                       jnp.asarray(band_radius, dt),
                       jnp.asarray(threshold, dt), int(steps), tuple(tile),
                       bool(interpret))
