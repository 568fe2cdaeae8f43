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


def _make_kernel(gshape, tile, nzp, with_rms=False, banded=False,
                 skip_inactive=False, pack=None):
    """``banded=True`` adds an SMEM (nbx, nby) int32 activity-mask input
    after the scalar args; inactive tiles skip the stencil entirely and
    move ONLY their owned region (passthrough copy) — the narrow-band
    restriction the reference applies to exactly this loop
    (``set3d.f90:402,420``, masks ``subs.f90:178-207``).  The kernel is
    memory-bound (~15 VPU ops/cell), so skipped window DMAs convert
    near-proportionally into step time.

    ``skip_inactive=True`` (requires ``banded``) drops even the
    passthrough: the output buffer is ALIASED to a carry input that
    already holds every frozen tile's values (a ping-pong double buffer
    kept in sync by the caller — see ``minmax_flow_narrowband``), so an
    inactive
    tile starts no DMA, waits no semaphore, and computes nothing.  This
    is what makes banding pay on a memory-bound kernel: the passthrough
    form still moves ~85% of a tile's dense traffic.

    ``pack`` (static (tpg, spt)): GEOMETRY PACKING — the HBM array holds B
    same-shape geometries' padded blocks concatenated along x (``spt``
    tile-widths per block, ``tpg`` owned); each tile computes with its own
    geometry's local coordinates and per-geometry ``h1`` ((1, B) SMEM),
    and ``with_rms`` yields a (1, B) per-geometry change sum — see
    weno_pallas._make_kernel."""
    nx, ny, nz = gshape          # TRUE grid shape: bounds for global masks
    tx, ty = tile
    wx, wy = tx + 2, ty + 2 * YA
    if pack is not None:
        assert not skip_inactive

    def kernel(dx_ref, h1_ref, br_ref, th_ref, ox_ref, oy_ref, *rest):
        if banded:
            active_ref = rest[0]
            rest = rest[1:]
        phi_hbm = rest[0]
        rest = rest[1:]
        if skip_inactive:
            rest = rest[1:]          # carry input: same memory as out_hbm
        out_hbm = rest[0]
        rest = rest[1:]
        if with_rms:
            rms_ref, slab, oslab, in_sems, out_sems, racc = rest
        else:
            slab, oslab, in_sems, out_sems = rest
        bi = pl.program_id(0)
        bj = pl.program_id(1)
        nby = pl.num_programs(1)
        lin = bi * nby + bj
        n_blocks = pl.num_programs(0) * nby

        def hbm_wi(block_lin):
            # packed serving: tile-grid row -> HBM row, skipping the 2*XA
            # apron strip between consecutive geometries' padded blocks
            wi = block_lin // nby
            if pack is None:
                return wi
            tpg, spt = pack
            return wi + (wi // tpg) * (spt - tpg)

        def in_dma(slot, block_lin):
            wi = hbm_wi(block_lin)
            wj = block_lin % nby
            return pltpu.make_async_copy(
                phi_hbm.at[pl.ds(wi * tx + XA - 1, wx),
                           pl.ds(wj * ty, wy), :],
                slab.at[slot], in_sems.at[slot])

        def in_dma_small(slot, block_lin):
            # inactive tile: only the owned region moves (passthrough)
            wi = hbm_wi(block_lin)
            wj = block_lin % nby
            return pltpu.make_async_copy(
                phi_hbm.at[pl.ds(XA + wi * tx, tx),
                           pl.ds(YA + wj * ty, ty), :],
                slab.at[slot, pl.ds(1, tx), pl.ds(YA, ty), :],
                in_sems.at[slot])

        def block_active(block_lin):
            wi = block_lin // nby
            wj = block_lin % nby
            return active_ref[wi, wj] > 0

        def start_load(slot, block_lin):
            if not banded:
                in_dma(slot, block_lin).start()
                return
            act = block_active(block_lin)

            @pl.when(act)
            def _():
                in_dma(slot, block_lin).start()

            if not skip_inactive:
                @pl.when(~act)
                def _():
                    in_dma_small(slot, block_lin).start()

        def wait_load(slot, block_lin):
            if not banded:
                in_dma(slot, block_lin).wait()
                return
            act = block_active(block_lin)

            @pl.when(act)
            def _():
                in_dma(slot, block_lin).wait()

            if not skip_inactive:
                @pl.when(~act)
                def _():
                    in_dma_small(slot, block_lin).wait()

        def out_dma(slot, block_lin):
            wi = hbm_wi(block_lin)
            wj = block_lin % nby
            return pltpu.make_async_copy(
                oslab.at[slot],
                out_hbm.at[pl.ds(XA + wi * tx, tx),
                           pl.ds(YA + wj * ty, ty), :],
                out_sems.at[slot])

        @pl.when(lin == 0)
        def _():
            start_load(0, 0)

        @pl.when(lin + 1 < n_blocks)
        def _():
            start_load((lin + 1) % 2, lin + 1)

        wait_load(lin % 2, lin)
        slot = lin % 2

        dx = dx_ref[0, 0]
        # under packing, h1 is this tile's geometry's own step and the
        # global x coordinate restarts at each geometry's block
        if pack is None:
            h1 = h1_ref[0, 0]
            bix = bi
        else:
            h1 = h1_ref[0, bi // pack[0]]
            bix = bi % pack[0]
        band_radius = br_ref[0, 0]
        threshold = th_ref[0, 0]
        inv_dx2 = 1.0 / (dx * dx)

        def compute():
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
            # update gate: narrow band AND global interior (face cells
            # never update — the only cells whose stencil touches the
            # apron, so apron garbage is provably select-discarded; see
            # minmax_step)
            gx = (ox_ref[0, 0] + bix * tx
                  + jax.lax.broadcasted_iota(jnp.int32, (tx, 1, 1), 0))
            gy = (oy_ref[0, 0] + bj * ty
                  + jax.lax.broadcasted_iota(jnp.int32, (1, ty, 1), 1))
            gz = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nzp), 2)
            interior = ((gx >= 1) & (gx <= nx - 2) & (gy >= 1)
                        & (gy <= ny - 2) & (gz >= 1) & (gz <= nz - 2))
            nb = jnp.abs(c) < band_radius * dx
            return jnp.where(nb & interior, c + h1 * f, c)

        def wait_out(j):
            # semaphore hygiene under skipping: wait exactly the DMAs that
            # were started — tile j started its out iff it was active
            if skip_inactive:
                @pl.when(block_active(j))
                def _():
                    out_dma(j % 2, j).wait()
            else:
                out_dma(j % 2, j).wait()

        if with_rms:
            # under packing the accumulator restarts per geometry and lands
            # in that geometry's rms_ref slot (see weno_pallas._make_kernel)
            glen = n_blocks if pack is None else pack[0] * nby

            @pl.when(lin % glen == 0)
            def _():
                racc[0] = jnp.zeros((), slab.dtype)

        def store_rms():
            if pack is None:
                rms_ref[0, 0] = racc[0]
            else:
                rms_ref[0, lin // glen] = racc[0]

        if skip_inactive:
            @pl.when(lin >= 2)
            def _():
                wait_out(lin - 2)

            @pl.when(block_active(lin))
            def _():
                res = compute()
                if with_rms:
                    d = res - slab[slot, 1:1 + tx, YA:YA + ty, :]
                    racc[0] += jnp.sum(d * d)
                oslab[slot] = res
                out_dma(slot, lin).start()
        else:
            if banded:
                res = jax.lax.cond(
                    active_ref[bi, bj] > 0, compute,
                    lambda: slab[slot, 1:1 + tx, YA:YA + ty, :])
            else:
                res = compute()

            if with_rms:
                # fused convergence reduction: res == c outside
                # nb & interior (and exactly c for an inactive tile), so
                # no extra validity mask is needed
                d = res - slab[slot, 1:1 + tx, YA:YA + ty, :]
                racc[0] += jnp.sum(d * d)

            @pl.when(lin >= 2)
            def _():
                wait_out(lin - 2)

            oslab[slot] = res
            out_dma(slot, lin).start()

        if with_rms:
            store_rms()

        @pl.when(lin == n_blocks - 1)
        def _():
            @pl.when(n_blocks >= 2)
            def _():
                wait_out(lin - 1)
            wait_out(lin)

    return kernel, (wx, wy)


def _pick_tile(gshape):
    _, ny, _ = gshape
    ty = 128 if ny >= 96 else max(8, -(-ny // 8) * 8)
    return 8, min(ty, 128)


def _pick_fusedk_tile(gshape):
    """Tile for the BANDED fused-K path: measured v5e sweep at 256^3
    (sphere, owned-column masks, K=4): (16, 32) 112 us/step vs (8, 32)
    146, (16, 64) 158, (32, 32) 150, (8, 128) 187 — the frac x extension
    product is flat (~0.55), so the winner is set by per-program
    amortization against mask tightness."""
    nx, ny, _ = gshape
    tx = 16 if nx >= 32 else 8
    ty = 32 if ny >= 32 else max(8, -(-ny // 8) * 8)
    return tx, ty


@functools.partial(jax.jit, static_argnames=("gshape", "tile", "interpret",
                                             "with_rms", "pack"),
                   donate_argnames=("carry",))
def minmax_step_padded(phi_pad, dx, h1, band_radius, threshold, *, gshape,
                       tile, interpret, offsets=None, with_rms=False,
                       active=None, carry=None, pack=None):
    """One min/max Euler step on a padded-layout array.

    ``offsets`` (ox, oy): this block's global origin — (0, 0) single-device,
    the shard offset under domain decomposition.  ``with_rms=True`` returns
    ``(out, dsq)`` with the in-kernel sum of squared cell changes (see
    weno_pallas._pallas_step_padded).  ``active`` ((nbx, nby) int32,
    optional) enables narrow-band execution: tiles with ``active == 0``
    pass their owned cells through with a small DMA and skip everything
    else (see weno_pallas.tile_activity).

    ``carry`` (requires ``active``): a DONATED buffer already holding
    every inactive tile's owned values; the output aliases it, and
    inactive tiles then move ZERO bytes — no DMA, no compute, no
    semaphore.  Callers maintain the ping-pong invariant (the previous
    iterate qualifies whenever no frozen-tile cell changed in the last
    two steps — see ``minmax_flow_narrowband``).

    ``pack`` (static int B): ``phi_pad`` holds B same-shape geometries'
    padded blocks concatenated along x (weno_pallas.pack_for_pallas);
    ``gshape`` is the per-geometry true shape, ``h1`` may be a (B,)
    per-geometry vector, and ``with_rms`` returns a (B,) vector — one
    launch steps the whole serving batch (see
    weno_pallas._pallas_step_padded)."""
    nx, ny, nz = gshape
    tx, ty = tile
    nxp = phi_pad.shape[0] - 2 * XA
    nyp = phi_pad.shape[1] - 2 * YA
    nzp = phi_pad.shape[2]
    if offsets is None:
        offsets = (jnp.int32(0), jnp.int32(0))
    banded = active is not None
    skip = carry is not None
    assert not skip or banded, "carry requires an activity mask"
    if pack is not None:
        assert not skip
        sxp = phi_pad.shape[0] // pack
        nxp_g = sxp - 2 * XA
        assert sxp * pack == phi_pad.shape[0] and sxp % tx == 0 \
            and nxp_g % tx == 0, "packed blocks must be tile-aligned"
        pack_k = (nxp_g // tx, sxp // tx)
    else:
        pack_k = None
    kernel, (wx, wy) = _make_kernel(gshape, tile, nzp, with_rms=with_rms,
                                    banded=banded, skip_inactive=skip,
                                    pack=pack_k)
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
    out_shape = jax.ShapeDtypeStruct(phi_pad.shape, dt)
    out_specs = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [
        pltpu.VMEM((2, wx, wy, nzp), dt),
        pltpu.VMEM((2, tx, ty, nzp), dt),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if with_rms:
        rms_w = 1 if pack is None else pack
        out_shape = (out_shape, jax.ShapeDtypeStruct((1, rms_w), dt))
        out_specs = (out_specs, pl.BlockSpec((1, rms_w), lambda i, j: (0, 0),
                                             memory_space=pltpu.SMEM))
        scratch = scratch + [pltpu.SMEM((1,), dt)]
    if pack is None:
        h1_arg, h1_spec = s(h1), scalar
    else:
        h1_arg = jnp.reshape(jnp.broadcast_to(jnp.asarray(h1, dt), (pack,)),
                             (1, pack))
        h1_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [scalar, h1_spec, scalar, scalar, int_scalar, int_scalar]
    args = [s(dx), h1_arg, s(band_radius), s(threshold),
            jnp.reshape(jnp.asarray(offsets[0], jnp.int32), (1, 1)),
            jnp.reshape(jnp.asarray(offsets[1], jnp.int32), (1, 1))]
    if banded:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.asarray(active, jnp.int32))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    args.append(phi_pad)
    aliases = {}
    if skip:
        aliases[len(args)] = 0       # carry input aliases the phi output
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(carry)
    grid = ((nxp // tx, nyp // ty) if pack is None
            else (pack * pack_k[0], nyp // ty))
    res = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=int(vmem_limit),
        ),
        interpret=interpret,
    )(*args)
    if with_rms:
        return res[0], (res[1][0, 0] if pack is None else res[1][0, :])
    return res


def minmax_pallas_applicable(phi, avg_halfwidth, use_true_curvature) -> bool:
    return (avg_halfwidth == 1 and not use_true_curvature
            and pallas_supported(phi.shape, phi.dtype))


# ----------------------------- fused-K kernel ------------------------------

def _make_fusedk_kernel(gshape, tile, nzp, ksteps, with_rms=False,
                        banded=False, skip_inactive=False):
    """K Euler steps fused into ONE kernel pass (overlap-compute).

    The single-step kernel is HBM-bound (~15 VPU ops/cell vs 8 B/cell of
    traffic), so K steps amortize the window+writeback traffic K-fold:
    the window is widened by ±K in x (y reuses the ±YA apron, z wraps in
    lanes) and each inner step recomputes a shrinking extension region —
    cells of neighboring tiles evolve identically here (pure Jacobi), so
    the K-step trajectory is BITWISE equal to K single-step calls; the
    extension compute overhead is ((tx+2e)(ty+2e))/(tx*ty) per step.
    Banding composes at column granularity exactly as in _make_kernel:
    an out-of-band cell's own-value gate means frozen tiles cannot
    change over ANY number of fused steps.
    """
    nx, ny, nz = gshape
    tx, ty = tile
    K = ksteps
    assert 1 <= K <= XA and K <= YA
    wx, wy = tx + 2 * K, ty + 2 * YA

    def kernel(dx_ref, h1_ref, br_ref, th_ref, ox_ref, oy_ref, *rest):
        if banded:
            active_ref = rest[0]
            rest = rest[1:]
        phi_hbm = rest[0]
        rest = rest[1:]
        if skip_inactive:
            rest = rest[1:]          # carry input: same memory as out_hbm
        out_hbm = rest[0]
        rest = rest[1:]
        if with_rms:
            rms_ref, slab, oslab, in_sems, out_sems, racc = rest
        else:
            slab, oslab, in_sems, out_sems = rest
        bi = pl.program_id(0)
        bj = pl.program_id(1)
        nby = pl.num_programs(1)
        lin = bi * nby + bj
        n_blocks = pl.num_programs(0) * nby

        def in_dma(slot, block_lin):
            wi = block_lin // nby
            wj = block_lin % nby
            return pltpu.make_async_copy(
                phi_hbm.at[pl.ds(wi * tx + XA - K, wx),
                           pl.ds(wj * ty, wy), :],
                slab.at[slot], in_sems.at[slot])

        def in_dma_small(slot, block_lin):
            wi = block_lin // nby
            wj = block_lin % nby
            return pltpu.make_async_copy(
                phi_hbm.at[pl.ds(XA + wi * tx, tx),
                           pl.ds(YA + wj * ty, ty), :],
                slab.at[slot, pl.ds(K, tx), pl.ds(YA, ty), :],
                in_sems.at[slot])

        def block_active(block_lin):
            wi = block_lin // nby
            wj = block_lin % nby
            return active_ref[wi, wj] > 0

        def start_load(slot, block_lin):
            if not banded:
                in_dma(slot, block_lin).start()
                return
            act = block_active(block_lin)

            @pl.when(act)
            def _():
                in_dma(slot, block_lin).start()

            if not skip_inactive:
                @pl.when(~act)
                def _():
                    in_dma_small(slot, block_lin).start()

        def wait_load(slot, block_lin):
            if not banded:
                in_dma(slot, block_lin).wait()
                return
            act = block_active(block_lin)

            @pl.when(act)
            def _():
                in_dma(slot, block_lin).wait()

            if not skip_inactive:
                @pl.when(~act)
                def _():
                    in_dma_small(slot, block_lin).wait()

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
            start_load(0, 0)

        @pl.when(lin + 1 < n_blocks)
        def _():
            start_load((lin + 1) % 2, lin + 1)

        wait_load(lin % 2, lin)
        slot = lin % 2

        dx = dx_ref[0, 0]
        h1 = h1_ref[0, 0]
        band_radius = br_ref[0, 0]
        threshold = th_ref[0, 0]
        inv_dx2 = 1.0 / (dx * dx)

        def compute():
            # inner steps mirror _make_kernel's expression order exactly,
            # so each fused step is bitwise identical to a dense step.
            # The interior gate is step-invariant: build it once at the
            # widest extension and slice per step (the per-step gx/gy/gz
            # iota compares were ~15% of the VPU budget).
            exw, eyw = tx + 2 * (K - 1), ty + 2 * (K - 1)
            gx = (ox_ref[0, 0] + bi * tx - (K - 1)
                  + jax.lax.broadcasted_iota(jnp.int32, (exw, 1, 1), 0))
            gy = (oy_ref[0, 0] + bj * ty - (K - 1)
                  + jax.lax.broadcasted_iota(jnp.int32, (1, eyw, 1), 1))
            gz = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nzp), 2)
            interior_w = ((gx >= 1) & (gx <= nx - 2) & (gy >= 1)
                          & (gy <= ny - 2) & (gz >= 1) & (gz <= nz - 2))
            cur = slab[slot, :, YA - K:YA + ty + K, :]
            d = None
            for k in range(K):
                e = K - 1 - k
                exk, eyk = tx + 2 * e, ty + 2 * e
                c = cur[1:1 + exk, 1:1 + eyk, :]
                sum6 = (cur[0:exk, 1:1 + eyk, :]
                        + cur[2:2 + exk, 1:1 + eyk, :]
                        + cur[1:1 + exk, 0:eyk, :]
                        + cur[1:1 + exk, 2:2 + eyk, :]
                        + _roll(c, -1, 2) + _roll(c, 1, 2))
                lap = (sum6 - 6.0 * c) * inv_dx2
                pave = (sum6 + c) * (1.0 / 7.0)
                f = jnp.where(pave < threshold, jnp.minimum(lap, 0.0),
                              jnp.maximum(lap, 0.0))
                q = K - 1 - e
                interior = interior_w[q:q + exk, q:q + eyk, :]
                nb = jnp.abs(c) < band_radius * dx
                res = jnp.where(nb & interior, c + h1 * f, c)
                if k == K - 1 and with_rms:
                    d = res - c
                cur = res
            return cur, d

        def wait_out(j):
            if skip_inactive:
                @pl.when(block_active(j))
                def _():
                    out_dma(j % 2, j).wait()
            else:
                out_dma(j % 2, j).wait()

        if with_rms:
            @pl.when(lin == 0)
            def _():
                racc[0] = jnp.zeros((), slab.dtype)

        @pl.when(lin >= 2)
        def _():
            wait_out(lin - 2)

        if skip_inactive:
            @pl.when(block_active(lin))
            def _():
                res, d = compute()
                if with_rms:
                    racc[0] += jnp.sum(d * d)
                oslab[slot] = res
                out_dma(slot, lin).start()
        else:
            if banded:
                def thru():
                    return (slab[slot, K:K + tx, YA:YA + ty, :],
                            jnp.zeros((tx, ty, nzp), slab.dtype)
                            if with_rms else None)
                res, d = jax.lax.cond(block_active(lin), compute, thru) \
                    if with_rms else (jax.lax.cond(
                        block_active(lin), lambda: compute()[0],
                        lambda: slab[slot, K:K + tx, YA:YA + ty, :]), None)
            else:
                res, d = compute()
            if with_rms:
                racc[0] += jnp.sum(d * d)
            oslab[slot] = res
            out_dma(slot, lin).start()

        if with_rms:
            rms_ref[0, 0] = racc[0]

        @pl.when(lin == n_blocks - 1)
        def _():
            @pl.when(n_blocks >= 2)
            def _():
                wait_out(lin - 1)
            wait_out(lin)

    return kernel, (wx, wy)


@functools.partial(jax.jit, static_argnames=("gshape", "tile", "interpret",
                                             "with_rms", "ksteps"),
                   donate_argnames=("carry",))
def minmax_fusedk_padded(phi_pad, dx, h1, band_radius, threshold, *, gshape,
                         tile, interpret, ksteps, offsets=None,
                         with_rms=False, active=None, carry=None):
    """``ksteps`` fused min/max Euler steps in one kernel launch
    (bitwise equal to ``ksteps`` calls of :func:`minmax_step_padded`).

    ``with_rms`` returns ``(out, dsq)`` where dsq is the LAST inner
    step's sum of squared changes (the tail-sampled convergence metric).
    ``active``/``carry`` as in :func:`minmax_step_padded` (column-granular
    banding; zero-copy skip via a donated, output-aliased carry)."""
    nx, ny, nz = gshape
    tx, ty = tile
    nxp = phi_pad.shape[0] - 2 * XA
    nyp = phi_pad.shape[1] - 2 * YA
    nzp = phi_pad.shape[2]
    if offsets is None:
        offsets = (jnp.int32(0), jnp.int32(0))
    banded = active is not None
    skip = carry is not None
    assert not skip or banded, "carry requires an activity mask"
    kernel, (wx, wy) = _make_fusedk_kernel(
        gshape, tile, nzp, ksteps, with_rms=with_rms, banded=banded,
        skip_inactive=skip)
    scalar = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                          memory_space=pltpu.SMEM)
    itemsize = phi_pad.dtype.itemsize
    vmem_limit = min(100 * 1024 * 1024,
                     (2 * (wx * wy + tx * ty) + 14 * wx * wy)
                     * nzp * itemsize)
    dt = phi_pad.dtype

    def s(v):
        return jnp.reshape(jnp.asarray(v, dt), (1, 1))

    int_scalar = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                              memory_space=pltpu.SMEM)
    out_shape = jax.ShapeDtypeStruct(phi_pad.shape, dt)
    out_specs = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [
        pltpu.VMEM((2, wx, wy, nzp), dt),
        pltpu.VMEM((2, tx, ty, nzp), dt),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if with_rms:
        out_shape = (out_shape, jax.ShapeDtypeStruct((1, 1), dt))
        out_specs = (out_specs, pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                                             memory_space=pltpu.SMEM))
        scratch = scratch + [pltpu.SMEM((1,), dt)]
    in_specs = [scalar, scalar, scalar, scalar, int_scalar, int_scalar]
    args = [s(dx), s(h1), s(band_radius), s(threshold),
            jnp.reshape(jnp.asarray(offsets[0], jnp.int32), (1, 1)),
            jnp.reshape(jnp.asarray(offsets[1], jnp.int32), (1, 1))]
    if banded:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.asarray(active, jnp.int32))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    args.append(phi_pad)
    aliases = {}
    if skip:
        aliases[len(args)] = 0       # carry input aliases the phi output
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(carry)
    res = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(nxp // tx, nyp // ty),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=int(vmem_limit),
        ),
        interpret=interpret,
    )(*args)
    if with_rms:
        return res[0], res[1][0, 0]
    return res


# ----------------------------- backward kernel -----------------------------

def _make_bwd_kernel(gshape, tile, nzp, banded=False):
    """Hand adjoint of the min/max Euler step, in GATHER form.

    The step is a radius-1 stencil (~30 ops/cell), so unlike the WENO
    adjoint (scatter-accumulate with HBM read-modify-write), the transpose
    is computed write-once: each owned cell's phi-cotangent gathers the
    ``cot_sum6`` of its 6 neighbors, which are recomputed on a +-1-extended
    region from a window 2 cells wider than the forward's.  Extra compute
    is (tx+2)(ty+2)/(tx*ty) ~ 1.3x of a cheap kernel; in exchange there is
    no serialized accumulate phase and no zero-initialized output alias.

    Adjoint math (forward in ``_make_kernel``): with
    ``res = c + gate * h1 * f``, ``f = sel ? min(lap,0) : max(lap,0)``,
    ``lap = (sum6 - 6c)/dx^2``:
    - the band/interior gate and the 7-point-average switch are booleans —
      no cotangent flows through them (``band_radius``/``threshold`` get
      exact zero cotangents);
    - ``d min(lap,0)/d lap`` is 1/0 with 0.5 at the exact tie — matching
      JAX's ``lax.min`` convention so the kernel VJP equals the jnp VJP;
    - ``cot_phi = cot_c + gather_6(cot_sum6)`` where
      ``cot_c = g - 6/dx^2 * cot_lap`` and ``cot_sum6 = cot_lap / dx^2``;
    - scalars: ``cot_h1 = sum(gate * f * g)``,
      ``cot_dx = -2/dx * sum(cot_lap * lap)`` (from d(1/dx^2)/d dx).

    Windows are sanitized (zeroed outside the true grid) so garbage in
    never-written apron/round-up HBM cannot poison the adjoint; gated
    cotangents are zero there, so sanitization changes no real cotangent.

    ``banded=True`` adds an SMEM (nbx, nby) int32 activity mask (use a
    ±1-cell-dilated band criterion, e.g. tile_activity window="band4"):
    an inactive tile's cotangent is identically the upstream ``g`` (no
    in-band cell in its ±1-extended region ⇒ every gathered cot_sum6 is
    zero and cot_c == g), so only its owned g slab moves (passthrough).
    """
    nx, ny, nz = gshape
    tx, ty = tile
    wxb, wy = tx + 4, ty + 2 * YA          # phi/g window: +-2 in x around tile
    ex, ey = tx + 2, ty + 2                # extended compute region (+-1)

    def kernel(dx_ref, h1_ref, br_ref, th_ref, ox_ref, oy_ref, *rest):
        if banded:
            active_ref = rest[0]
            rest = rest[1:]
        (phi_hbm, g_hbm, cot_hbm, cotdx_ref, coth1_ref,
         pwin_d, gwin_d, owin_d, acc, in_sems, out_sems) = rest
        bi = pl.program_id(0)
        bj = pl.program_id(1)
        nby = pl.num_programs(1)
        lin = bi * nby + bj
        n_blocks = pl.num_programs(0) * nby

        def in_dmas(slot, block_lin):
            wi = block_lin // nby
            wj = block_lin % nby
            p = pltpu.make_async_copy(
                phi_hbm.at[pl.ds(wi * tx + XA - 2, wxb),
                           pl.ds(wj * ty, wy), :],
                pwin_d.at[slot], in_sems.at[slot, 0])
            g = pltpu.make_async_copy(
                g_hbm.at[pl.ds(wi * tx + XA - 2, wxb),
                         pl.ds(wj * ty, wy), :],
                gwin_d.at[slot], in_sems.at[slot, 1])
            return p, g

        def in_dma_small(slot, block_lin):
            # inactive tile: only the owned g slab moves (identity cot)
            wi = block_lin // nby
            wj = block_lin % nby
            return pltpu.make_async_copy(
                g_hbm.at[pl.ds(XA + wi * tx, tx),
                         pl.ds(YA + wj * ty, ty), :],
                gwin_d.at[slot, pl.ds(2, tx), pl.ds(YA, ty), :],
                in_sems.at[slot, 1])

        def block_active(block_lin):
            wi = block_lin // nby
            wj = block_lin % nby
            return active_ref[wi, wj] > 0

        def start_loads(slot, block_lin):
            if not banded:
                for c in in_dmas(slot, block_lin):
                    c.start()
                return
            act = block_active(block_lin)

            @pl.when(act)
            def _():
                for c in in_dmas(slot, block_lin):
                    c.start()

            @pl.when(~act)
            def _():
                in_dma_small(slot, block_lin).start()

        def wait_loads(slot, block_lin):
            if not banded:
                for c in in_dmas(slot, block_lin):
                    c.wait()
                return
            act = block_active(block_lin)

            @pl.when(act)
            def _():
                for c in in_dmas(slot, block_lin):
                    c.wait()

            @pl.when(~act)
            def _():
                in_dma_small(slot, block_lin).wait()

        def out_dma(slot, block_lin):
            wi = block_lin // nby
            wj = block_lin % nby
            return pltpu.make_async_copy(
                owin_d.at[slot],
                cot_hbm.at[pl.ds(XA + wi * tx, tx),
                           pl.ds(YA + wj * ty, ty), :],
                out_sems.at[slot])

        @pl.when(lin == 0)
        def _():
            start_loads(0, 0)

        @pl.when(lin + 1 < n_blocks)
        def _():
            start_loads((lin + 1) % 2, lin + 1)

        slot = lin % 2
        wait_loads(slot, lin)

        dx = dx_ref[0, 0]
        h1 = h1_ref[0, 0]
        band_radius = br_ref[0, 0]
        threshold = th_ref[0, 0]
        inv_dx2 = 1.0 / (dx * dx)

        def compute():
            # global true-grid coordinates of the window
            wgx = (ox_ref[0, 0] + bi * tx - 2
                   + jax.lax.broadcasted_iota(jnp.int32, (wxb, 1, 1), 0))
            wgy = (oy_ref[0, 0] + bj * ty - YA
                   + jax.lax.broadcasted_iota(jnp.int32, (1, wy, 1), 1))
            wgz = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nzp), 2)
            wvalid = ((wgx >= 0) & (wgx < nx) & (wgy >= 0) & (wgy < ny)
                      & (wgz < nz))
            pw = jnp.where(wvalid, pwin_d[slot], 0.0)
            gw = jnp.where(wvalid, gwin_d[slot], 0.0)

            def sl(a, dxo, dyo):
                # +-1-extended region shifted by (dxo, dyo): window coords
                # x0 = 1 + dxo in [0, 2], y0 = YA - 1 + dyo
                return a[1 + dxo:1 + dxo + ex,
                         YA - 1 + dyo:YA - 1 + dyo + ey, :]

            c = sl(pw, 0, 0)
            sum6 = (sl(pw, -1, 0) + sl(pw, 1, 0) + sl(pw, 0, -1)
                    + sl(pw, 0, 1) + _roll(c, -1, 2) + _roll(c, 1, 2))
            lap = (sum6 - 6.0 * c) * inv_dx2
            pave = (sum6 + c) * (1.0 / 7.0)
            # gate on the extended region, from global coordinates
            egx = wgx[1:1 + ex]
            egy = wgy[:, YA - 1:YA - 1 + ey, :]
            interior = ((egx >= 1) & (egx <= nx - 2) & (egy >= 1)
                        & (egy <= ny - 2) & (wgz >= 1) & (wgz <= nz - 2))
            nb = jnp.abs(c) < band_radius * dx
            gate = nb & interior

            sel_min = pave < threshold
            f = jnp.where(sel_min, jnp.minimum(lap, 0.0),
                          jnp.maximum(lap, 0.0))
            # d clamp / d lap with JAX's 0.5-at-tie convention
            half = jnp.asarray(0.5, lap.dtype)
            one = jnp.asarray(1.0, lap.dtype)
            zero = jnp.asarray(0.0, lap.dtype)
            dmin = jnp.where(lap < 0.0, one,
                             jnp.where(lap == 0.0, half, zero))
            dmax = jnp.where(lap > 0.0, one,
                             jnp.where(lap == 0.0, half, zero))
            dlap = jnp.where(sel_min, dmin, dmax)

            ge = sl(gw, 0, 0)
            cot_f = jnp.where(gate, h1 * ge, 0.0)
            cot_lap = cot_f * dlap
            cot_sum6 = cot_lap * inv_dx2
            cot_c = ge - 6.0 * inv_dx2 * cot_lap

            # gather transpose: owned slice of the extended region is
            # [1:1+tx, 1:1+ty]; each xy direction contributes its
            # OPPOSITE shift, z via the inverse rotation (wrapped lanes
            # carry gated zeros only)
            def own(a, dxo=0, dyo=0):
                return a[1 - dxo:1 - dxo + tx, 1 - dyo:1 - dyo + ty, :]

            # scalar sums run over OWNED cells only — the +-1-extended
            # ring belongs to neighboring tiles (double-count otherwise)
            ddx = (-2.0 / dx) * jnp.sum(own(cot_lap * lap))
            dh1 = jnp.sum(own(jnp.where(gate, f * ge, 0.0)))
            cot = (own(cot_c)
                   + own(cot_sum6, -1, 0) + own(cot_sum6, 1, 0)
                   + own(cot_sum6, 0, -1) + own(cot_sum6, 0, 1)
                   + own(_roll(cot_sum6, 1, 2))
                   + own(_roll(cot_sum6, -1, 2)))
            return cot, ddx, dh1

        def passthrough():
            # no in-band cell within ±1 of this tile: every gathered
            # cot term is zero and the cotangent is identically g
            z = jnp.zeros((), dx.dtype)
            return gwin_d[slot, 2:2 + tx, YA:YA + ty, :], z, z

        @pl.when(lin == 0)
        def _():
            acc[0] = jnp.zeros((), dx.dtype)
            acc[1] = jnp.zeros((), dx.dtype)

        if banded:
            cot, ddx, dh1 = jax.lax.cond(block_active(lin), compute,
                                         passthrough)
        else:
            cot, ddx, dh1 = compute()
        acc[0] += ddx
        acc[1] += dh1
        cotdx_ref[0, 0] = acc[0]
        coth1_ref[0, 0] = acc[1]

        @pl.when(lin >= 2)
        def _():
            out_dma(slot, lin - 2).wait()

        owin_d[slot] = cot
        out_dma(slot, lin).start()

        @pl.when(lin == n_blocks - 1)
        def _():
            @pl.when(n_blocks >= 2)
            def _():
                out_dma((lin - 1) % 2, lin - 1).wait()
            out_dma(slot, lin).wait()

    return kernel, (wxb, wy)


@functools.partial(jax.jit, static_argnames=("gshape", "tile", "interpret"))
def minmax_bwd_padded(phi_pad, g_pad, dx, h1, band_radius, threshold, *,
                      gshape, tile, interpret, offsets=None, active=None):
    """VJP of :func:`minmax_step_padded` w.r.t. (phi_pad, dx, h1).

    ``g_pad`` must be ZERO at apron/round-up positions; returned phi
    cotangents are written for owned cells only (aprons unwritten —
    callers crop, and the scan backward's window loads mask them out).
    ``band_radius``/``threshold`` have exactly zero cotangent (they enter
    through booleans only), so they are not returned.

    ``active`` ((nbx, nby) int32, a ±1-dilated band criterion — e.g.
    tile_activity window="band4"): inactive tiles are identity-cotangent
    passthroughs that load only their owned g slab (see _make_bwd_kernel).
    """
    nx, ny, nz = gshape
    tx, ty = tile
    nxp = phi_pad.shape[0] - 2 * XA
    nyp = phi_pad.shape[1] - 2 * YA
    nzp = phi_pad.shape[2]
    if offsets is None:
        offsets = (jnp.int32(0), jnp.int32(0))
    kernel, (wxb, wy) = _make_bwd_kernel(gshape, tile, nzp,
                                         banded=active is not None)
    scalar = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                          memory_space=pltpu.SMEM)
    itemsize = phi_pad.dtype.itemsize
    ext_bytes = (tx + 2) * (ty + 2) * nzp * itemsize
    vmem_limit = min(100 * 1024 * 1024,
                     (4 * wxb * wy + 2 * tx * ty) * nzp * itemsize
                     + 24 * ext_bytes)
    dt = phi_pad.dtype

    def s(v):
        return jnp.reshape(jnp.asarray(v, dt), (1, 1))

    int_scalar = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                              memory_space=pltpu.SMEM)
    scalar_shape = jax.ShapeDtypeStruct((1, 1), dt)
    smem_out = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                            memory_space=pltpu.SMEM)
    in_specs = [scalar, scalar, scalar, scalar, int_scalar, int_scalar]
    args = [s(dx), s(h1), s(band_radius), s(threshold),
            jnp.reshape(jnp.asarray(offsets[0], jnp.int32), (1, 1)),
            jnp.reshape(jnp.asarray(offsets[1], jnp.int32), (1, 1))]
    if active is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.asarray(active, jnp.int32))
    in_specs += [pl.BlockSpec(memory_space=pl.ANY),
                 pl.BlockSpec(memory_space=pl.ANY)]
    args += [phi_pad, g_pad]
    cot_phi, cot_dx, cot_h1 = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(phi_pad.shape, dt),
                   scalar_shape, scalar_shape),
        grid=(nxp // tx, nyp // ty),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY), smem_out, smem_out),
        scratch_shapes=[
            pltpu.VMEM((2, wxb, wy, nzp), dt),
            pltpu.VMEM((2, wxb, wy, nzp), dt),
            pltpu.VMEM((2, tx, ty, nzp), dt),
            pltpu.SMEM((2,), dt),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=int(vmem_limit),
        ),
        interpret=interpret,
    )(*args)
    return cot_phi, cot_dx[0, 0], cot_h1[0, 0]


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
    from .weno_pallas import _FLAT_TRAJ_BYTES
    gshape = phi0.shape
    phi_pad = pad_for_pallas(phi0, tile)
    if steps * phi_pad.size * phi_pad.dtype.itemsize <= _FLAT_TRAJ_BYTES:
        # stash the trajectory during the forward scan: backward skips
        # its recompute pass (1 fwd + 1 bwd per step instead of 2 + 1)
        def step(p, _):
            out = minmax_step_padded(p, dx, h1, band_radius, threshold,
                                     gshape=gshape, tile=tile,
                                     interpret=interpret)
            return out, p
        phi_end, traj = jax.lax.scan(step, phi_pad, None, length=steps)
        return (crop_from_pallas(phi_end, gshape),
                (phi0, dx, h1, band_radius, threshold, traj))
    out = _fused_scan(phi0, dx, h1, band_radius, threshold, steps, tile,
                      interpret)
    return out, (phi0, dx, h1, band_radius, threshold, None)


def _fused_scan_bwd(steps, tile, interpret, res, g):
    """Reverse scan of the fused min/max ADJOINT kernel (gather-form hand
    transpose, :func:`minmax_bwd_padded`), with the same flat/sqrt-N
    trajectory checkpointing as the reinit backward
    (``weno_pallas.checkpointed_reverse``).  Replaces the r1-style jnp-step
    replay VJP (VERDICT r2 weak #3)."""
    from .weno_pallas import checkpointed_reverse, pad_zero_for_pallas
    phi0, dx, h1, band_radius, threshold, traj = res
    gshape = phi0.shape
    phi_pad0 = pad_for_pallas(phi0, tile)
    kw = dict(gshape=gshape, tile=tile, interpret=interpret)

    def fstep(p):
        return minmax_step_padded(p, dx, h1, band_radius, threshold, **kw)

    def bstep(carry, p_in):
        gp, cdx_acc, ch_acc = carry
        cp, cdx, ch = minmax_bwd_padded(p_in, gp, dx, h1, band_radius,
                                        threshold, **kw)
        return (cp, cdx_acc + cdx, ch_acc + ch)

    zero = jnp.zeros((), phi0.dtype)
    carry0 = (pad_zero_for_pallas(g, tile), zero, zero)
    if traj is not None:
        (gp, cdx, ch1), _ = jax.lax.scan(
            lambda c, p_in: (bstep(c, p_in), None), carry0, traj,
            reverse=True)
    else:
        gp, cdx, ch1 = checkpointed_reverse(
            fstep, bstep, phi_pad0, carry0, steps,
            phi_pad0.size * phi_pad0.dtype.itemsize)
    # band_radius/threshold enter through booleans only: exact zero cots
    return (crop_from_pallas(gp, gshape), cdx, ch1, zero, zero)


_fused_scan.defvjp(_fused_scan_fwd, _fused_scan_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _banded_scan_mm(phi0, dx, h1, band_radius, threshold, steps,
                    refresh_every, tile, interpret):
    """Narrow-band differentiable min/max scan: bitwise equal to
    :func:`_fused_scan` (banded min/max IS the dense function — frozen
    tiles could never have changed), executed with tile skipping in BOTH
    sweeps.  Forward chunks refresh an owned-cell mask (exact, no
    margin); the backward recomputes each chunk's trajectory and runs
    the banded adjoint with a ±1-dilated (band4) mask from the same
    chunk-start iterate — the in-band set only ever shrinks, so the
    chunk-start dilation covers every step in the chunk."""
    from .weno_pallas import tile_activity
    gshape = phi0.shape
    pad = pad_for_pallas(phi0, tile)
    kw = dict(gshape=gshape, tile=tile, interpret=interpret)
    r = min(int(refresh_every), int(steps)) if steps else 1
    n_full, rem = divmod(int(steps), r)

    def chunk(p, nsteps):
        active = tile_activity(p, gshape, tile, dx, band_radius,
                               window="owned")

        def step(q, _):
            return minmax_step_padded(q, dx, h1, band_radius, threshold,
                                      active=active, **kw), None

        out, _ = jax.lax.scan(step, p, None, length=nsteps)
        return out

    def body(p, _):
        return chunk(p, r), None

    pad, _ = jax.lax.scan(body, pad, None, length=n_full)
    if rem:
        pad = chunk(pad, rem)
    return crop_from_pallas(pad, gshape)


def _banded_scan_mm_fwd(phi0, dx, h1, band_radius, threshold, steps,
                        refresh_every, tile, interpret):
    from .weno_pallas import tile_activity
    gshape = phi0.shape
    pad0 = pad_for_pallas(phi0, tile)
    kw = dict(gshape=gshape, tile=tile, interpret=interpret)
    r = min(int(refresh_every), int(steps)) if steps else 1
    n_full, rem = divmod(int(steps), r)

    def chunk(p, nsteps):
        active = tile_activity(p, gshape, tile, dx, band_radius,
                               window="owned")

        def step(q, _):
            return minmax_step_padded(q, dx, h1, band_radius, threshold,
                                      active=active, **kw), None

        out, _ = jax.lax.scan(step, p, None, length=nsteps)
        return out

    def body(p, _):
        return chunk(p, r), p               # stash chunk-START iterate

    p_end, snaps = jax.lax.scan(body, pad0, None, length=n_full)
    rem_start = p_end if rem else None
    out = chunk(p_end, rem) if rem else p_end
    return (crop_from_pallas(out, gshape),
            (phi0, dx, h1, band_radius, threshold, snaps, rem_start))


def _banded_scan_mm_bwd(steps, refresh_every, tile, interpret, res, g):
    from .weno_pallas import pad_zero_for_pallas, tile_activity
    phi0, dx, h1, band_radius, threshold, snaps, rem_start = res
    gshape = phi0.shape
    kw = dict(gshape=gshape, tile=tile, interpret=interpret)
    r = min(int(refresh_every), int(steps)) if steps else 1
    n_full, rem = divmod(int(steps), r)
    zero = jnp.zeros((), phi0.dtype)

    def chunk_bwd(carry, p_start, nsteps):
        act_f = tile_activity(p_start, gshape, tile, dx, band_radius,
                              window="owned")
        act_b = tile_activity(p_start, gshape, tile, dx, band_radius,
                              window="band4")

        def fscan(q, _):
            return minmax_step_padded(q, dx, h1, band_radius, threshold,
                                      active=act_f, **kw), q

        _, traj = jax.lax.scan(fscan, p_start, None, length=nsteps)

        def bstep(c, p_in):
            gp, cdx_acc, ch_acc = c
            cp, cdx, ch = minmax_bwd_padded(p_in, gp, dx, h1, band_radius,
                                            threshold, active=act_b, **kw)
            return (cp, cdx_acc + cdx, ch_acc + ch), None

        c, _ = jax.lax.scan(bstep, carry, traj, reverse=True)
        return c

    carry = (pad_zero_for_pallas(g, tile), zero, zero)
    if rem:
        carry = chunk_bwd(carry, rem_start, rem)

    def body(c, p_start):
        return chunk_bwd(c, p_start, r), None

    carry, _ = jax.lax.scan(body, carry, snaps, reverse=True)
    gp, cdx, ch1 = carry
    return (crop_from_pallas(gp, gshape), cdx, ch1, zero, zero)


_banded_scan_mm.defvjp(_banded_scan_mm_fwd, _banded_scan_mm_bwd)


def minmax_scan_pallas(phi0, dx, h1, steps: int, *, band_radius=4.1,
                       threshold=0.0, tile=None, interpret=None,
                       banded=False, refresh_every: int = 16):
    """``steps`` fused min/max smoothing steps (persistent padded layout).

    ``banded=True`` runs the narrow-band differentiable variant — same
    values and gradients (banded min/max equals the dense function), but
    frozen tiles are skipped in both the forward and adjoint sweeps
    (see :func:`_banded_scan_mm`)."""
    phi0 = jnp.asarray(phi0)
    from .weno_pallas import best_axis_order, inverse_perm
    perm = best_axis_order(phi0.shape)
    if perm != (0, 1, 2):
        out = minmax_scan_pallas(jnp.transpose(phi0, perm), dx, h1, steps,
                                 band_radius=band_radius,
                                 threshold=threshold, tile=tile,
                                 interpret=interpret, banded=banded,
                                 refresh_every=refresh_every)
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
    if banded:
        return _banded_scan_mm(phi0, jnp.asarray(dx, dt),
                               jnp.asarray(h1, dt),
                               jnp.asarray(band_radius, dt),
                               jnp.asarray(threshold, dt), int(steps),
                               int(refresh_every), tuple(tile),
                               bool(interpret))
    return _fused_scan(phi0, jnp.asarray(dx, dt), jnp.asarray(h1, dt),
                       jnp.asarray(band_radius, dt),
                       jnp.asarray(threshold, dt), int(steps), tuple(tile),
                       bool(interpret))
