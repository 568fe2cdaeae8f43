"""Min/max curvature-flow smoothing loop.

Re-expresses the time loop living in the reference main program
(``set3d.f90:394-462``): explicit Euler on the narrow band with the min/max
RHS, whole-grid RMS steady-state detection (tol 1e-7, ``set3d.f90:448``), and
a narrow-band refresh every iteration (``set3d.f90:460``).

The reference updates phi in place during its second pass (Gauss–Seidel
flavored); here the step is Jacobi — pure, fused, deterministic — matching
at the converged-field level (SURVEY.md §2 quirk 7).  Second derivatives are
computed for the whole grid in one vectorized pass and the *update* is gated
by the band mask; this is branchless-equivalent to the reference's
``IF (phiNB==1)`` guards because, within one iteration, F is only consumed
where the same-iteration mask is 1.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.band import narrow_band
from ..ops.minmax import minmax_rhs
from ..utils.metrics import emit_iteration


class MinMaxResult(NamedTuple):
    phi: jnp.ndarray
    iterations: jnp.ndarray
    final_rms: jnp.ndarray
    diverged: jnp.ndarray


def minmax_step(phi, dx, h1, *, band_radius=4.1, threshold=0.0,
                avg_halfwidth=1, use_true_curvature=False):
    """One Jacobi min/max Euler step gated by the active narrow band.

    The update is additionally gated to the grid interior: the reference
    loops the full grid (set3d.f90:399,417) but its stencils at face cells
    would read out of bounds — it implicitly relies on the far-field pad
    keeping the band off the faces.  Masking the faces gives well-defined
    semantics that coincide with the reference wherever the reference is
    defined (and makes the Pallas kernel's apron reads provably inert).
    """
    from ..ops.stencil import interior_mask
    nb, _ = narrow_band(phi, dx, band_radius, band_radius)
    f = minmax_rhs(phi, dx, threshold=threshold, avg_halfwidth=avg_halfwidth,
                   use_true_curvature=use_true_curvature)
    return jnp.where(nb & interior_mask(phi.shape, 1), phi + h1 * f, phi)


def _rms(a, b, shape):
    denom = (shape[0] - 1) * (shape[1] - 1) * (shape[2] - 1)
    d = a - b
    return jnp.sqrt(jnp.sum(d * d) / denom)


def _route_pallas(use_pallas, phi, avg_halfwidth, use_true_curvature):
    from ..ops.minmax_pallas import minmax_pallas_applicable
    if use_pallas == "auto":
        return (jax.default_backend() == "tpu"
                and minmax_pallas_applicable(phi, avg_halfwidth,
                                             use_true_curvature))
    return bool(use_pallas)


@partial(jax.jit, static_argnames=("iters", "avg_halfwidth",
                                   "use_true_curvature", "use_pallas",
                                   "metrics_every"))
def minmax_flow(phi0, dx, h1, iters: int, tol, *, band_radius=4.1,
                threshold=0.0, avg_halfwidth=1,
                use_true_curvature=False,
                use_pallas="auto", metrics_every: int = 0) -> MinMaxResult:
    """Run up to ``iters`` smoothing steps with RMS early exit.

    ``use_pallas`` (default: auto-on for float32 grids on TPU — bf16/f64 use
    the jnp path) runs each step as the fused radius-1 Pallas kernel on a
    persistent padded layout.
    """
    shape = phi0.shape

    if _route_pallas(use_pallas, phi0, avg_halfwidth, use_true_curvature):
        from ..ops import minmax_pallas as mp
        from ..ops.weno_pallas import best_axis_order, inverse_perm
        perm = best_axis_order(shape)
        if perm != (0, 1, 2):
            # solve in the axis order minimizing lane/sublane round-up;
            # the step is axis-symmetric (Laplacian + box average)
            r = minmax_flow(jnp.transpose(phi0, perm), dx, h1, iters, tol,
                            band_radius=band_radius, threshold=threshold,
                            avg_halfwidth=avg_halfwidth,
                            use_true_curvature=use_true_curvature,
                            use_pallas=use_pallas,
                            metrics_every=metrics_every)
            return r._replace(phi=jnp.transpose(r.phi, inverse_perm(perm)))
        tile = mp._pick_tile(shape)
        interpret = jax.default_backend() != "tpu"
        dt = phi0.dtype
        phi_pad0 = mp.pad_for_pallas(phi0, tile)
        args = (jnp.asarray(dx, dt), jnp.asarray(h1, dt),
                jnp.asarray(band_radius, dt), jnp.asarray(threshold, dt))

        denom = (shape[0] - 1) * (shape[1] - 1) * (shape[2] - 1)

        def body(state):
            p, _, n, _, _ = state
            # convergence reduction fused into the kernel: at ~50 ops/cell
            # this step is HBM-adjacent, and a separate RMS would add two
            # full-grid passes (~40% of the step time)
            new, dsq = mp.minmax_step_padded(p, *args, gshape=shape,
                                             tile=tile, interpret=interpret,
                                             with_rms=True)
            rms = jnp.sqrt(dsq / denom)
            emit_iteration("minmax", metrics_every, n + 1, rms,
                           cells=shape[0] * shape[1] * shape[2])
            done = (rms < tol) | jnp.isnan(rms)
            return (new, p, n + 1, rms, done)

        def cond(state):
            _, _, n, rms, done = state
            return (~done) & (n < iters)

        init = (phi_pad0, phi_pad0, jnp.int32(0),
                jnp.asarray(jnp.inf, dt), jnp.bool_(False))
        phi_pad, _, n, rms, _ = jax.lax.while_loop(cond, body, init)
        return MinMaxResult(phi=mp.crop_from_pallas(phi_pad, shape),
                            iterations=n, final_rms=rms,
                            diverged=jnp.isnan(rms))

    def cond(state):
        _, _, n, rms, done = state
        return (~done) & (n < iters)

    def body(state):
        phi, _, n, _, _ = state
        new = minmax_step(phi, dx, h1, band_radius=band_radius,
                          threshold=threshold, avg_halfwidth=avg_halfwidth,
                          use_true_curvature=use_true_curvature)
        rms = _rms(new, phi, shape)
        emit_iteration("minmax", metrics_every, n + 1, rms,
                       cells=shape[0] * shape[1] * shape[2])
        done = (rms < tol) | jnp.isnan(rms)
        return (new, phi, n + 1, rms, done)

    init = (phi0, phi0, jnp.int32(0), jnp.asarray(jnp.inf, phi0.dtype),
            jnp.bool_(False))
    phi, _, n, rms, _ = jax.lax.while_loop(cond, body, init)
    return MinMaxResult(phi=phi, iterations=n, final_rms=rms,
                        diverged=jnp.isnan(rms))


def minmax_flow_narrowband(phi0, dx, h1, iters: int, tol, *,
                           band_radius=4.1, threshold=0.0,
                           refresh_every: int = 16, use_pallas="auto",
                           metrics_every: int = 0,
                           axis_order=None) -> MinMaxResult:
    """Narrow-band min/max flow: whole kernel tiles outside the active
    band are skipped (owned-cell passthrough with a small DMA).

    Unlike banded *reinit* (where frozen far-field tiles deliberately skip
    their relaxation toward exact distance), banded min/max is EXACT: the
    dense step's update gate is ``|phi_c| < band_radius*dx`` on the cell's
    OWN value, and a cell in a frozen tile never changes, so it can never
    enter the band between mask refreshes — the banded solve equals the
    dense solve bit-for-bit at every iterate, for any ``refresh_every``
    (the refresh only re-tightens the mask as the band shrinks).  This is
    the loop the reference only ever runs on the band
    (``set3d.f90:402,420``); the kernel is memory-bound, so skipped tile
    DMAs convert near-proportionally into time.

    ``axis_order`` as in :func:`~..solvers.reinit.reinit_narrowband`:
    concrete inputs get the band-aware layout.
    """
    from ..ops import weno_pallas as wp
    route = _route_pallas(use_pallas, phi0, 1, False)
    if not route:
        return minmax_flow(phi0, dx, h1, iters, tol,
                           band_radius=band_radius, threshold=threshold,
                           use_pallas=False, metrics_every=metrics_every)
    concrete = not any(isinstance(v, jax.core.Tracer)
                       for v in (phi0, dx, h1))
    if axis_order is not None:
        perm = tuple(axis_order)
    elif concrete:
        from ..ops import minmax_pallas as mp
        perm = wp.banded_axis_order(phi0, dx, band_radius, 0.0,
                                    tile=mp._pick_tile(phi0.shape))
    else:
        perm = wp.best_axis_order(phi0.shape)
    if concrete and axis_order is None:
        # occupancy guard: with zero-copy tile skipping (ping-pong carry,
        # inactive tiles move no bytes) banding pays whenever a real
        # fraction of columns is skippable — measured on v5e: 1.4x at 69%
        # active tiles (sphere 256³), 2.3x on the flat fixture.  Only
        # near-full occupancy routes dense; banding stays EXACT either way.
        from ..ops import minmax_pallas as mp
        tile = mp._pick_tile(tuple(phi0.shape[q] for q in perm))
        pp = jnp.transpose(phi0, perm) if perm != (0, 1, 2) else phi0
        proj = jnp.any(jnp.abs(pp) < band_radius * dx, axis=2)
        nbx = -(-pp.shape[0] // tile[0])
        nby = -(-pp.shape[1] // tile[1])
        pad2 = jnp.pad(proj, ((0, nbx * tile[0] - pp.shape[0]),
                              (0, nby * tile[1] - pp.shape[1])))
        occ = float(jnp.mean(jnp.max(
            pad2.reshape(nbx, tile[0], nby, tile[1]),
            axis=(1, 3)).astype(jnp.float32)))
        if occ > 0.85:
            return minmax_flow(phi0, dx, h1, iters, tol,
                               band_radius=band_radius,
                               threshold=threshold, use_pallas=use_pallas,
                               metrics_every=metrics_every)
    p = phi0 if perm == (0, 1, 2) else jnp.transpose(phi0, perm)
    r = _minmax_narrowband_core(p, dx, h1, iters, tol,
                                band_radius=band_radius,
                                threshold=threshold,
                                refresh_every=refresh_every,
                                use_pallas=use_pallas,
                                metrics_every=metrics_every)
    if perm != (0, 1, 2):
        r = r._replace(phi=jnp.transpose(r.phi, wp.inverse_perm(perm)))
    return r


@partial(jax.jit, static_argnames=("iters", "refresh_every", "use_pallas",
                                   "metrics_every"))
def _minmax_narrowband_core(phi0, dx, h1, iters: int, tol, *, band_radius,
                            threshold, refresh_every: int, use_pallas,
                            metrics_every) -> MinMaxResult:
    """Jitted banded while_loop on an already laid-out grid."""
    from ..ops import minmax_pallas as mp
    from ..ops import weno_pallas as wp
    shape = phi0.shape
    if not _route_pallas(use_pallas, phi0, 1, False):  # tiny permuted axes
        return minmax_flow(phi0, dx, h1, iters, tol,
                           band_radius=band_radius, threshold=threshold,
                           use_pallas=False, metrics_every=metrics_every)
    # the DENSE kernel's tile: at ~15 ops/cell the step is per-tile-
    # overhead-bound below ~0.3 ms, and a (8, 16) banded tile (as the
    # reinit core uses) measured 7x SLOWER than dense at 256^3 — 8x the
    # tile count swamps any skipped traffic.  Sparsity is exploited at
    # tx=8 granularity along the FIRST axis, which banded_axis_order
    # rotates onto the band-sparse axis for flat geometry.
    tile = mp._pick_tile(shape)
    interpret = jax.default_backend() != "tpu"
    dt = phi0.dtype
    phi_pad0 = mp.pad_for_pallas(phi0, tile)
    args = (jnp.asarray(dx, dt), jnp.asarray(h1, dt),
            jnp.asarray(band_radius, dt), jnp.asarray(threshold, dt))
    denom = (shape[0] - 1) * (shape[1] - 1) * (shape[2] - 1)
    kw = dict(gshape=shape, tile=tile, interpret=interpret)

    def refresh(p):
        # margin 1 cell is freeze hysteresis for the ping-pong skip: a
        # cell that changed at the chunk's last step updated from inside
        # the band, so |phi| <= band_radius*dx + h1*|F| < (band_radius+1)*dx
        # (h1 = CFL*dx^2, |lap| <~ 6*L/dx, L the local Lipschitz bound) —
        # its tile therefore stays active one more chunk, in which BOTH
        # ping-pong buffers receive its (now unchanging) value before the
        # tile can freeze.  The margin only ever keeps more tiles active,
        # so the solve stays exact.
        return wp.tile_activity(p, shape, tile, args[0], band_radius,
                                margin_cells=1.0)

    if iters <= 0:
        return MinMaxResult(phi=phi0, iterations=jnp.int32(0),
                            final_rms=jnp.asarray(jnp.inf, dt),
                            diverged=jnp.bool_(False))

    # ping-pong double buffer: inactive tiles move ZERO bytes because the
    # output aliases the PREVIOUS iterate, whose frozen-tile values are
    # identical (out-of-band cells never change).  The first step runs in
    # passthrough mode to mint a second distinct buffer.
    active0 = refresh(phi_pad0)
    cur0, dsq0 = mp.minmax_step_padded(phi_pad0, *args, active=active0,
                                       with_rms=True, **kw)
    rms0 = jnp.sqrt(dsq0 / denom)

    # chunks are rounded up to EVEN so the double-step unrolling below
    # never needs the odd trailing step (and its swap copy) except on the
    # final partial chunk; refreshing a step later only delays mask
    # tightening, which is always sound
    chunk = refresh_every + (refresh_every % 2)

    def body(state):
        prev, cur, n, _, _ = state
        active = refresh(cur)
        m = jnp.minimum(jnp.int32(chunk), jnp.int32(iters) - n)

        # DOUBLE steps keep XLA's in-place while-loop carries: step a
        # writes prev's buffer, step b writes cur's buffer, so each carry
        # slot updates in place and the swap that would force XLA to copy
        # a full buffer per step (measured: a zero-work all-frozen "skip"
        # step costing 1.7x a dense step) never happens.
        def double(_, st):
            pv, cr, _ = st
            a = mp.minmax_step_padded(cr, *args, active=active,
                                      carry=pv, **kw)
            b, dsq = mp.minmax_step_padded(a, *args, active=active,
                                           carry=cr, with_rms=True, **kw)
            return (a, b, dsq)

        prev, cur, dsq = jax.lax.fori_loop(
            0, m // 2, double, (prev, cur, jnp.zeros((), dt)))

        def odd_step(st):
            # trailing single step of an odd chunk: passthrough mode (a
            # fresh output buffer — the one swap-copy per odd chunk)
            pv, cr, _ = st
            nw, d = mp.minmax_step_padded(cr, *args, active=active,
                                          with_rms=True, **kw)
            return (cr, nw, d)

        prev, cur, dsq = jax.lax.cond(m % 2 == 1, odd_step,
                                      lambda st: st, (prev, cur, dsq))
        rms = jnp.sqrt(dsq / denom)
        emit_iteration("minmax_narrowband", metrics_every,
                       n + m, rms, band_tiles=jnp.sum(active),
                       cells=shape[0] * shape[1] * shape[2])
        done = (rms < tol) | jnp.isnan(rms)
        return (prev, cur, n + m, rms, done)

    def cond(state):
        _, _, n, _, done = state
        return (~done) & (n < iters)

    init = (phi_pad0, cur0, jnp.int32(1), rms0,
            (rms0 < tol) | jnp.isnan(rms0))
    _, phi_pad, n, rms, _ = jax.lax.while_loop(cond, body, init)
    return MinMaxResult(phi=mp.crop_from_pallas(phi_pad, shape),
                        iterations=n, final_rms=rms,
                        diverged=jnp.isnan(rms))


@partial(jax.jit, static_argnames=("steps", "avg_halfwidth",
                                   "use_true_curvature", "remat",
                                   "use_pallas"))
def minmax_flow_fixed(phi0, dx, h1, steps: int, *, band_radius=4.1,
                      threshold=0.0, avg_halfwidth=1,
                      use_true_curvature=False, remat=True,
                      use_pallas="auto"):
    """Fixed-step differentiable variant (scan + per-step remat)."""
    if _route_pallas(use_pallas, phi0, avg_halfwidth, use_true_curvature):
        from ..ops.minmax_pallas import minmax_scan_pallas
        return minmax_scan_pallas(phi0, dx, h1, steps,
                                  band_radius=band_radius,
                                  threshold=threshold)

    def step(phi, _):
        return minmax_step(phi, dx, h1, band_radius=band_radius,
                           threshold=threshold,
                           avg_halfwidth=avg_halfwidth,
                           use_true_curvature=use_true_curvature), None

    if remat:
        step = jax.checkpoint(step)
    phi, _ = jax.lax.scan(step, phi0, None, length=steps)
    return phi
