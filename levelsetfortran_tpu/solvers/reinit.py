"""Eikonal reinitialization: pseudo-time integration of
``phi_t = sgn(phi_0)(1 - |grad phi|)``.

Re-expresses reference ``subs.f90:717-931`` (``reinit``).  The reference uses
in-place Gauss–Seidel with 8 alternating raster sweep orders — inherently
serial and order-dependent (SURVEY.md §2 quirk 7).  The TPU-native design is
a *Jacobi* update: every cell reads the previous iterate, making the step a
pure data-parallel function that XLA fuses into one stencil pass and that is
deterministic and structurally race-free.  Jacobi converges to the same
|grad phi| = 1 steady state; per the survey, fields are matched at the
converged level (RMS tolerances), not per-iteration.

Update region, BCs, RMS stop, and NaN tripwire mirror the reference:
interior-only update (``subs.f90:744-746``), ghost extrapolation BC
(``:858-897``), ``RMS = sqrt(sum((phi - phi_prev)^2)/(nx*ny*nz))`` with the
reference's nx*ny*nz denominator (``:914``), early exit below ``tol``
(``:915``), NaN detection (``:926``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.sign import smeared_sign
from ..ops.stencil import boundary_extrapolate, interior_mask
from ..ops.weno import weno_godunov
from ..utils.metrics import emit_iteration


class ReinitResult(NamedTuple):
    phi: jnp.ndarray
    iterations: jnp.ndarray     # number of steps actually run
    final_rms: jnp.ndarray
    diverged: jnp.ndarray       # NaN tripwire (reference STOPs; we flag)


def reinit_step(phi, phi_sign_src, dx, h, *, eps_scale=1e-6, eps_floor=None,
                quirk_y_p5_zero=False, grad_fn=None):
    """One Jacobi pseudo-time step (the body of one reference sweep).

    ``phi_sign_src`` is the field whose smeared sign drives the flow — frozen
    at solver entry like the reference's ``phiS`` (subs.f90:731).
    ``grad_fn`` optionally overrides the |grad| operator (e.g. with the
    Pallas kernel); it must map phi -> grad_mag.
    """
    if grad_fn is None:
        # Godunov branch selected by the frozen sign source (Sussman et al.)
        # — required for Jacobi stability; see ops.weno.godunov_select.
        grad_mag, _ = weno_godunov(phi, dx, eps_scale=eps_scale,
                                   eps_floor=eps_floor,
                                   quirk_y_p5_zero=quirk_y_p5_zero,
                                   switch=phi_sign_src)
    else:
        grad_mag = grad_fn(phi)
    sgn = smeared_sign(phi_sign_src, dx, grad_mag)
    update = phi + h * sgn * (1.0 - grad_mag)
    phi = jnp.where(interior_mask(phi.shape, 1), update, phi)
    return boundary_extrapolate(phi, dx)


def _rms(a, b, shape):
    # Reference denominator is nx*ny*nz, i.e. points-1 per axis (subs.f90:914).
    denom = (shape[0] - 1) * (shape[1] - 1) * (shape[2] - 1)
    d = a - b
    return jnp.sqrt(jnp.sum(d * d) / denom)


def _use_pallas(use_pallas, phi, grad_fn) -> bool:
    """"auto" enables the fused kernel on real TPU when it applies."""
    from ..ops.weno_pallas import pallas_supported
    if grad_fn is not None:
        return False
    if use_pallas == "auto":
        return (jax.default_backend() == "tpu"
                and pallas_supported(phi.shape, phi.dtype))
    return bool(use_pallas)


@partial(jax.jit, static_argnames=("iters", "eps_scale", "eps_floor",
                                   "quirk_y_p5_zero", "grad_fn",
                                   "use_pallas", "precise", "metrics_every"))
def reinit(phi0, dx, h, iters: int, tol, *, sign_src=None, eps_scale=1e-6,
           eps_floor=None, quirk_y_p5_zero=False, grad_fn=None,
           use_pallas="auto", precise=False,
           metrics_every: int = 0) -> ReinitResult:
    """Run up to ``iters`` Jacobi steps, stopping early at RMS < tol.

    Uses ``lax.while_loop`` (forward-only; for the differentiable pipeline
    use :func:`reinit_fixed`).  ``sign_src`` is the frozen sign-source
    field (default: phi0) — pass the original field when continuing a
    partially-relaxed solve (e.g. checkpoint resume) so the trajectory is
    identical to an uninterrupted run.  With ``use_pallas`` (default: auto-on
    for float32 grids on TPU — see ``weno_pallas.pallas_supported``; bf16 and
    f64 use the jnp path) each step is the fused Pallas kernel operating on a
    persistent padded layout; ``precise=True`` forces bit-exact reciprocals
    in the WENO weights instead of Newton-refined hardware reciprocals
    (~1 ulp, measurably indistinguishable in the converged field).
    """
    phi_sign_src = phi0 if sign_src is None else sign_src
    shape = phi0.shape

    if _use_pallas(use_pallas, phi0, grad_fn):
        from ..ops import weno_pallas as wp
        # auto-orientation: solve in the axis order that minimizes the
        # padded layout's lane/sublane round-up (flat grids: up to 3x less
        # compute).  Disabled under the axis-specific y-p5 quirk.
        perm = ((0, 1, 2) if quirk_y_p5_zero
                else wp.best_axis_order(shape))
        if perm != (0, 1, 2):
            r = reinit(
                jnp.transpose(phi0, perm), dx, h, iters, tol,
                sign_src=(None if sign_src is None
                          else jnp.transpose(jnp.asarray(sign_src,
                                                         phi0.dtype), perm)),
                eps_scale=eps_scale, eps_floor=eps_floor,
                quirk_y_p5_zero=quirk_y_p5_zero, grad_fn=grad_fn,
                use_pallas=use_pallas, precise=precise,
                metrics_every=metrics_every)
            return r._replace(
                phi=jnp.transpose(r.phi, wp.inverse_perm(perm)))
        eps_floor_r, tile, interpret = wp._resolve(phi0, eps_floor, None,
                                                   None)
        dxa = jnp.asarray(dx, phi0.dtype)
        ha = jnp.asarray(h, phi0.dtype)
        phi_pad0 = wp.pad_for_pallas(phi0, tile)
        sign_pad = (phi_pad0 if sign_src is None
                    else wp.pad_for_pallas(jnp.asarray(sign_src, phi0.dtype),
                                           tile))

        denom = (shape[0] - 1) * (shape[1] - 1) * (shape[2] - 1)

        def body(state):
            p, _, n, _, _ = state
            # the convergence reduction is fused INTO the kernel (both
            # iterates are already in VMEM per tile) — a separate _rms
            # would cost two extra full-grid HBM passes per step
            new, dsq = wp._pallas_step_padded(
                p, sign_pad, dxa, ha, gshape=shape, eps_scale=eps_scale,
                eps_floor=eps_floor_r, quirk_y_p5_zero=quirk_y_p5_zero,
                tile=tile, interpret=interpret, precise=precise,
                with_rms=True)
            rms = jnp.sqrt(dsq / denom)
            emit_iteration("reinit", metrics_every, n + 1, rms,
                           cells=shape[0] * shape[1] * shape[2])
            done = (rms < tol) | jnp.isnan(rms)
            return (new, p, n + 1, rms, done)

        def cond(state):
            _, _, n, rms, done = state
            return (~done) & (n < iters)

        init = (phi_pad0, phi_pad0, jnp.int32(0),
                jnp.asarray(jnp.inf, phi0.dtype), jnp.bool_(False))
        phi_pad, _, n, rms, _ = jax.lax.while_loop(cond, body, init)
        return ReinitResult(phi=wp.crop_from_pallas(phi_pad, shape),
                            iterations=n, final_rms=rms,
                            diverged=jnp.isnan(rms))

    def cond(state):
        _, _, n, rms, done = state
        return (~done) & (n < iters)

    def body(state):
        phi, phi_prev, n, _, _ = state
        new = reinit_step(phi, phi_sign_src, dx, h, eps_scale=eps_scale,
                          eps_floor=eps_floor,
                          quirk_y_p5_zero=quirk_y_p5_zero, grad_fn=grad_fn)
        rms = _rms(new, phi, shape)
        emit_iteration("reinit", metrics_every, n + 1, rms,
                       cells=shape[0] * shape[1] * shape[2])
        done = (rms < tol) | jnp.isnan(rms)
        return (new, phi, n + 1, rms, done)

    init = (phi0, phi0, jnp.int32(0), jnp.asarray(jnp.inf, phi0.dtype),
            jnp.bool_(False))
    phi, _, n, rms, _ = jax.lax.while_loop(cond, body, init)
    return ReinitResult(phi=phi, iterations=n, final_rms=rms,
                        diverged=jnp.isnan(rms))


def reinit_narrowband(phi0, dx, h, iters: int, tol, *, band_radius=8.1,
                      refresh_every: int = 8, sign_src=None, eps_scale=1e-6,
                      eps_floor=None, quirk_y_p5_zero=False,
                      use_pallas="auto", precise=False,
                      metrics_every: int = 0,
                      axis_order=None) -> ReinitResult:
    """Narrow-band reinitialization (BASELINE config 3).

    The TPU analogue of the reference's narrow-band masks
    (``subs.f90:178-207``, applied in ``set3d.f90:402,420``): instead of a
    per-cell mask (which saves nothing on a vector machine), whole kernel
    tiles are skipped when no cell in their stencil window lies within
    ``band_radius * dx`` of the interface.  The activity mask is refreshed
    every ``refresh_every`` steps with a drift margin of
    ``refresh_every * h / dx`` cells (each pseudo-time step moves |phi| by
    at most ``h``), so a cell can never enter the band unnoticed between
    refreshes.  Cells in frozen tiles keep their current value — far-field
    relaxation toward exact distance is deliberately skipped, which is the
    point of a narrow-band method; within the band the update equals the
    dense solver's up to the (converged, sub-tolerance) far-field residual.

    The RMS convergence check (and hence early exit) runs once per
    ``refresh_every``-step chunk, on the last two iterates — saving the two
    full-grid HBM passes the dense solver spends on RMS every step; the
    iteration count rounds up to a multiple of ``refresh_every``.

    A finer y tile (16) than the dense kernel's (64) is used so the
    tile-granular skip follows the band geometry more closely; skipped
    tiles also skip their stencil-window DMAs.

    ``axis_order`` overrides the layout permutation.  By default, CONCRETE
    inputs get a band-aware layout (``weno_pallas.banded_axis_order``):
    the tile skip granularity is a whole lane-axis column, so band
    sparsity along the lane axis is unusable — flat geometry (the
    twoCube10 class) wants its long sparse axis TILED even at the price
    of lane padding, since the padding lands in tiles the activity mask
    skips.  Traced inputs (called under an outer jit) fall back to the
    dense-volume-optimal order.

    Falls back to the dense jnp solver when the fused kernel doesn't apply.
    """
    if not _use_pallas(use_pallas, phi0, None):
        return reinit(phi0, dx, h, iters, tol, sign_src=sign_src,
                      eps_scale=eps_scale, eps_floor=eps_floor,
                      quirk_y_p5_zero=quirk_y_p5_zero, use_pallas=False,
                      precise=precise, metrics_every=metrics_every)
    from ..ops import weno_pallas as wp
    concrete = not any(isinstance(v, jax.core.Tracer) for v in (phi0, dx, h))
    if axis_order is not None:
        perm = tuple(axis_order)
    elif quirk_y_p5_zero:
        perm = (0, 1, 2)
    elif concrete:
        perm = wp.banded_axis_order(phi0, dx, band_radius,
                                    refresh_every * h / dx)
    else:
        perm = wp.best_axis_order(phi0.shape)   # no data to inspect
    p = phi0 if perm == (0, 1, 2) else jnp.transpose(phi0, perm)
    s = sign_src
    if s is not None and perm != (0, 1, 2):
        s = jnp.transpose(jnp.asarray(s, phi0.dtype), perm)
    r = _reinit_narrowband_core(
        p, dx, h, iters, tol, band_radius=band_radius,
        refresh_every=refresh_every, sign_src=s, eps_scale=eps_scale,
        eps_floor=eps_floor, quirk_y_p5_zero=quirk_y_p5_zero,
        use_pallas=use_pallas, precise=precise,
        metrics_every=metrics_every)
    if perm != (0, 1, 2):
        r = r._replace(phi=jnp.transpose(r.phi, wp.inverse_perm(perm)))
    return r


@partial(jax.jit, static_argnames=("iters", "refresh_every", "eps_scale",
                                   "eps_floor", "quirk_y_p5_zero",
                                   "use_pallas", "precise", "metrics_every"))
def _reinit_narrowband_core(phi0, dx, h, iters: int, tol, *, band_radius,
                            refresh_every: int, sign_src, eps_scale,
                            eps_floor, quirk_y_p5_zero, use_pallas,
                            precise, metrics_every) -> ReinitResult:
    """Jitted banded while_loop on an ALREADY laid-out grid (identity
    axis order; the public wrapper chooses the permutation)."""
    from ..ops import weno_pallas as wp
    shape = phi0.shape
    if not _use_pallas(use_pallas, phi0, None):   # e.g. tiny permuted axes
        return reinit(phi0, dx, h, iters, tol, sign_src=sign_src,
                      eps_scale=eps_scale, eps_floor=eps_floor,
                      quirk_y_p5_zero=quirk_y_p5_zero, use_pallas=False,
                      precise=precise, metrics_every=metrics_every)
    eps_floor_r, tile, interpret = wp._resolve(phi0, eps_floor, None, None)
    tile = (tile[0], min(tile[1], 16))
    dxa = jnp.asarray(dx, phi0.dtype)
    ha = jnp.asarray(h, phi0.dtype)
    phi_pad0 = wp.pad_for_pallas(phi0, tile)
    sign_pad = (phi_pad0 if sign_src is None
                else wp.pad_for_pallas(jnp.asarray(sign_src, phi0.dtype),
                                       tile))
    pairs = refresh_every // 2
    chunk = 1 + 2 * pairs
    # drift margin covers the ACTUAL chunk length (refresh_every rounded
    # up to odd for the passthrough + double-step structure below)
    margin = chunk * ha / dxa
    # within-column z-chunk compute skipping: the column DMA is kept (lane
    # windows cannot be sliced), but the WENO compute — what bounds this
    # kernel — runs only on (tx, ty, szc) boxes intersecting the band
    szc = wp._pick_szc(shape, phi_pad0.shape[2])
    kw = dict(gshape=shape, eps_scale=eps_scale, eps_floor=eps_floor_r,
              quirk_y_p5_zero=quirk_y_p5_zero, tile=tile,
              interpret=interpret, precise=precise, szc=szc)

    def refresh(p):
        return wp.tile_activity(p, shape, tile, dxa, band_radius,
                                margin_cells=margin, szc=szc,
                                window="band4")

    denom = (shape[0] - 1) * (shape[1] - 1) * (shape[2] - 1)
    # chunk structure: ONE passthrough-mode step (fresh output buffer;
    # frozen columns move as small owned-cell DMAs) re-mints a buffer
    # consistent with the JUST-REFRESHED mask, then `pairs` double steps
    # run ZERO-COPY: the output aliases the iterate from two steps ago,
    # whose frozen-column values are identical because the mask is fixed
    # within the chunk — frozen columns then move no bytes at all.  The
    # chunk's LAST step carries the fused RMS reduction, preserving the
    # dense solver's tail-sampled convergence metric (head sampling lags
    # a chunk and over-runs the solve — measured +70% iterations and a
    # 1.5x worse near-surface error on the twoCube10 pipeline).

    def body(state):
        p, n, _, _ = state
        active = refresh(p)
        cur, dsq = wp._pallas_step_padded(p, sign_pad, dxa, ha,
                                          active=active, with_rms=True,
                                          **kw)

        def double(_, st):
            pv, cr = st
            a = wp._pallas_step_padded(cr, sign_pad, dxa, ha,
                                       active=active, carry=pv, **kw)
            b = wp._pallas_step_padded(a, sign_pad, dxa, ha,
                                       active=active, carry=cr, **kw)
            return (a, b)

        if pairs:
            pv, cr = jax.lax.fori_loop(0, pairs - 1, double, (p, cur))
            a = wp._pallas_step_padded(cr, sign_pad, dxa, ha,
                                       active=active, carry=pv, **kw)
            cur, dsq = wp._pallas_step_padded(a, sign_pad, dxa, ha,
                                              active=active, carry=cr,
                                              with_rms=True, **kw)
        rms = jnp.sqrt(dsq / denom)
        # iteration counts advance in whole chunks, so the emit cadence
        # must be a chunk multiple or it never fires (metrics_every is
        # rounded to the nearest achievable chunk boundary)
        every = chunk * max(1, metrics_every // chunk) if metrics_every \
            else 0
        emit_iteration("reinit_narrowband", every,
                       n + chunk, rms,
                       band_tiles=jnp.sum(active != 0),
                       cells=shape[0] * shape[1] * shape[2])
        done = (rms < tol) | jnp.isnan(rms)
        return (cur, n + chunk, rms, done)

    def cond(state):
        _, n, _, done = state
        return (~done) & (n < iters)

    init = (phi_pad0, jnp.int32(0), jnp.asarray(jnp.inf, phi0.dtype),
            jnp.bool_(False))
    phi_pad, n, rms, _ = jax.lax.while_loop(cond, body, init)
    return ReinitResult(phi=wp.crop_from_pallas(phi_pad, shape),
                        iterations=n, final_rms=rms,
                        diverged=jnp.isnan(rms))


@partial(jax.jit, static_argnames=("steps", "eps_scale", "eps_floor",
                                   "quirk_y_p5_zero", "grad_fn", "remat",
                                   "use_pallas", "precise"))
def reinit_fixed(phi0, dx, h, steps: int, *, eps_scale=1e-6, eps_floor=None,
                 quirk_y_p5_zero=False, grad_fn=None, remat=True,
                 use_pallas="auto", precise=False):
    """Fixed-step reinit via ``lax.scan`` — reverse-mode differentiable.

    Backward memory: the jnp path rematerializes each step
    (``jax.checkpoint``) so only one field iterate per step is stored —
    never the ~200 per-step WENO intermediates.  The Pallas path runs the
    fused ADJOINT kernel per step in reverse; its trajectory of padded
    iterates is recomputed with the forward kernel — stashed flat for small
    solves, via two-level (sqrt-N) checkpointing above ~1.5 GB, so peak HBM
    is O(sqrt(steps)) padded arrays (weno_pallas._fused_scan_bwd) — the
    trade that makes end-to-end pixel->vertex gradients feasible at 256^3
    (200 steps) and 512^3 (50 steps) on a 16 GB chip.
    ``use_pallas``/``precise`` as in :func:`reinit`.
    """
    if _use_pallas(use_pallas, phi0, grad_fn):
        from ..ops.weno_pallas import reinit_scan_pallas
        return reinit_scan_pallas(phi0, dx, h, steps, eps_scale=eps_scale,
                                  eps_floor=eps_floor,
                                  quirk_y_p5_zero=quirk_y_p5_zero,
                                  precise=precise)

    phi_sign_src = phi0

    def step(phi, _):
        new = reinit_step(phi, phi_sign_src, dx, h, eps_scale=eps_scale,
                          eps_floor=eps_floor,
                          quirk_y_p5_zero=quirk_y_p5_zero, grad_fn=grad_fn)
        return new, None

    if remat:
        step = jax.checkpoint(step)
    phi, _ = jax.lax.scan(step, phi0, None, length=steps)
    return phi
