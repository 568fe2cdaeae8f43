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
    """Narrow-band min/max flow on the FUSED-K kernel.

    Two independent levers compose here, both EXACT (the banded solve
    equals the dense solve bit-for-bit at every iterate):

    * **K-step fusion** (``minmax_fusedk_padded``): the single-step
      kernel is HBM-bound, so K=4 steps per launch amortize the window
      traffic 4x at ~1.3x extension-compute overhead — a win even with
      every tile active.
    * **Zero-copy tile skipping**: the update gate is the cell's OWN
      frozen value, so a cell in an out-of-band tile can never change or
      enter the band — for ANY step size and ANY refresh interval (no
      margin precondition: each refresh chunk opens with one
      passthrough-mode call that re-mints a buffer consistent with the
      just-refreshed mask, and the following ping-pong pairs alias their
      outputs to the iterate from two calls ago, so frozen tiles move
      zero bytes).  The mask (``tile_activity`` with ``window="owned"``)
      only ever shrinks as the band contracts.

    This is the loop the reference only ever runs on the band
    (``set3d.f90:402,420``).  Iteration counts are exact: full fused
    chunks while they fit, then a single-step tail (bitwise-identical
    inner math) for the remainder.

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
                                    tile=mp._pick_fusedk_tile(phi0.shape))
    else:
        perm = wp.best_axis_order(phi0.shape)
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
    """Jitted banded while_loop on an already laid-out grid (see the
    public wrapper's docstring for the fused-K + zero-copy structure)."""
    from ..ops import minmax_pallas as mp
    from ..ops import weno_pallas as wp
    shape = phi0.shape
    if not _route_pallas(use_pallas, phi0, 1, False):  # tiny permuted axes
        return minmax_flow(phi0, dx, h1, iters, tol,
                           band_radius=band_radius, threshold=threshold,
                           use_pallas=False, metrics_every=metrics_every)
    # fused-K banding affords a much finer tile than the dense kernel:
    # K-step amortization of the per-program fixed costs makes the mask
    # tightness win (see _pick_fusedk_tile's measured sweep)
    tile = mp._pick_fusedk_tile(shape)
    interpret = jax.default_backend() != "tpu"
    dt = phi0.dtype
    phi_pad0 = mp.pad_for_pallas(phi0, tile)
    args = (jnp.asarray(dx, dt), jnp.asarray(h1, dt),
            jnp.asarray(band_radius, dt), jnp.asarray(threshold, dt))
    denom = (shape[0] - 1) * (shape[1] - 1) * (shape[2] - 1)
    kw = dict(gshape=shape, tile=tile, interpret=interpret)
    K = 4 if min(shape) >= 16 else 1     # fused depth (<= XA)
    pairs = max(0, (refresh_every // K) // 2)
    calls = 1 + 2 * pairs
    chunk_steps = K * calls

    def refresh(p):
        # owned-only criterion: EXACT for min/max freezing (no margin —
        # an out-of-band cell's own-value gate means it never changes),
        # and the per-chunk passthrough mint below keeps the ping-pong
        # buffers consistent across refreshes for any h1 (ADVICE r4)
        return wp.tile_activity(p, shape, tile, args[0], band_radius,
                                window="owned")

    if iters <= 0:
        return MinMaxResult(phi=phi0, iterations=jnp.int32(0),
                            final_rms=jnp.asarray(jnp.inf, dt),
                            diverged=jnp.bool_(False))

    def body(state):
        p, n, _, _ = state
        active = refresh(p)
        # passthrough mint (fresh buffer; frozen tiles small-DMA owned
        # cells), then ping-pong zero-copy pairs; the chunk's last call
        # carries the fused RMS (tail-sampled convergence metric)
        cur, dsq = mp.minmax_fusedk_padded(p, *args, ksteps=K,
                                           active=active, with_rms=True,
                                           **kw)

        def double(_, st):
            pv, cr = st
            a = mp.minmax_fusedk_padded(cr, *args, ksteps=K,
                                        active=active, carry=pv, **kw)
            b = mp.minmax_fusedk_padded(a, *args, ksteps=K,
                                        active=active, carry=cr, **kw)
            return (a, b)

        if pairs:
            pv, cr = jax.lax.fori_loop(0, pairs - 1, double, (p, cur))
            a = mp.minmax_fusedk_padded(cr, *args, ksteps=K,
                                        active=active, carry=pv, **kw)
            cur, dsq = mp.minmax_fusedk_padded(a, *args, ksteps=K,
                                               active=active, carry=cr,
                                               with_rms=True, **kw)
        rms = jnp.sqrt(dsq / denom)
        every = (chunk_steps * max(1, metrics_every // chunk_steps)
                 if metrics_every else 0)
        emit_iteration("minmax_narrowband", every,
                       n + chunk_steps, rms, band_tiles=jnp.sum(active),
                       cells=shape[0] * shape[1] * shape[2])
        done = (rms < tol) | jnp.isnan(rms)
        return (cur, n + chunk_steps, dsq, done)

    def cond(state):
        _, n, _, done = state
        return (~done) & (n + chunk_steps <= iters)

    init = (phi_pad0, jnp.int32(0), jnp.asarray(jnp.inf, dt),
            jnp.bool_(False))
    phi_pad, n, dsq, done = jax.lax.while_loop(cond, body, init)

    # single-step tail: exact iteration accounting for counts that are
    # not a multiple of the fused chunk (the single-step kernel's math is
    # bitwise identical to one fused inner step); skipped if converged
    rem = jnp.where(done, jnp.int32(0), jnp.int32(iters) - n)
    active_t = refresh(phi_pad)

    def tail(_, st):
        q, _ = st
        return mp.minmax_step_padded(q, *args, active=active_t,
                                     with_rms=True, **kw)

    phi_pad, dsq = jax.lax.fori_loop(0, rem, tail, (phi_pad, dsq))
    n = n + rem
    rms = jnp.sqrt(dsq / denom)
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
