"""Benchmark entry point: WENO5+Godunov reinit cell-updates/sec at 256^3.

This is the BASELINE.json north-star metric ("WENO5 cell-updates/sec/chip at
256^3").  The reference publishes no numbers (BASELINE.md); ``vs_baseline``
is reported against a 2.0e7 cell-updates/s serial-CPU estimate for the
reference's per-point Gauss-Seidel WENO sweep (O(400) flops/cell on one
core — the reference is single-threaded by construction, README.md:19).

Measured metrics (all recorded in BENCH_DETAIL.json; the REQUIRED single
JSON line on stdout carries the north-star forward number):

* ``reinit_fwd_256`` / ``reinit_fwd_512`` — fused forward kernel GCUPS
* ``reinit_bwd_256`` — fused Pallas ADJOINT kernel GCUPS (the backward
  pass of one reinit step, excluding the forward-trajectory recompute)
* ``minmax_256`` — fused min/max curvature-flow kernel GCUPS
* ``reinit_nb_256`` — narrow-band reinit speedup on a converged-ish sphere

Methodology: each timing is ``min`` over ``REPS`` runs of a compiled
two-point measurement (t(BIG steps) - t(SMALL steps)) so compile, dispatch
and device->host fetch overheads cancel.  Device dispatch through the axon
relay is asynchronous and ``block_until_ready`` may return before work
finishes, so every timed region is closed by fetching a scalar reduction.

Prints exactly ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import jax
import jax.numpy as jnp

REPS = 3
SMALL_STEPS = 5
BIG_STEPS = 25
SERIAL_BASELINE_CUPS = 2.0e7   # estimated reference serial throughput


def make_phi(n):
    xs = jnp.linspace(-1.0, 1.0, n, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
    sphere = jnp.sqrt(gx * gx + gy * gy + gz * gz) - 0.6
    return 2.0 * sphere   # distorted: reinit has real work to do


def timed_min(fn, *args):
    """min-of-REPS wall time of a compiled callable, completion-fenced by a
    scalar fetch (first call warms compile + transfer setup)."""
    float(fn(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def per_step_time(make_run, phi0):
    """Two-point overhead-cancelled per-step time."""
    t_small = timed_min(make_run(SMALL_STEPS), phi0)
    t_big = timed_min(make_run(BIG_STEPS), phi0)
    return max((t_big - t_small) / (BIG_STEPS - SMALL_STEPS), 1e-9)


def bench_reinit_fwd(n):
    from levelsetfortran_tpu.solvers.reinit import reinit_fixed
    phi0 = make_phi(n)
    dx = 2.0 / (n - 1)
    h = 0.1 * dx

    def make(steps):
        @jax.jit
        def run(p):
            return jnp.sum(reinit_fixed(p, dx, h, steps, remat=False,
                                        use_pallas="auto"))
        return run

    return n ** 3 / per_step_time(make, phi0)


def bench_reinit_bwd(n):
    """Adjoint kernel GCUPS: grad-of-scan costs (fwd scan + trajectory
    recompute + bwd scan) = 2 fwd + 1 bwd per step; subtract measured fwd."""
    from levelsetfortran_tpu.ops.weno_pallas import reinit_scan_pallas
    phi0 = make_phi(n)
    dx = 2.0 / (n - 1)
    h = 0.1 * dx

    def make_f(steps):
        @jax.jit
        def run(p):
            return jnp.sum(reinit_scan_pallas(p, dx, h, steps,
                                              precise=False))
        return run

    def make_g(steps):
        @jax.jit
        def run(p):
            grad = jax.grad(lambda q: jnp.sum(
                reinit_scan_pallas(q, dx, h, steps, precise=False)))(p)
            return jnp.sum(grad)
        return run

    t_fwd = per_step_time(make_f, phi0)
    t_grad = per_step_time(make_g, phi0)
    t_bwd = max(t_grad - 2.0 * t_fwd, 1e-9)
    return n ** 3 / t_bwd, n ** 3 / t_fwd, n ** 3 / t_grad


def bench_minmax(n):
    from levelsetfortran_tpu.solvers.minmax_flow import minmax_flow_fixed
    phi0 = make_phi(n)
    dx = 2.0 / (n - 1)
    h1 = 0.01 * dx * dx

    def make(steps):
        @jax.jit
        def run(p):
            return jnp.sum(minmax_flow_fixed(p, dx, h1, steps, remat=False))
        return run

    return n ** 3 / per_step_time(make, phi0)


def bench_narrowband(n):
    """Dense vs narrow-band reinit step time on a near-converged sphere SDF
    (band occupies ~a surface shell of tiles)."""
    from levelsetfortran_tpu.solvers.reinit import reinit, reinit_narrowband
    xs = jnp.linspace(-1.0, 1.0, n, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
    phi0 = jnp.sqrt(gx * gx + gy * gy + gz * gz) - 0.6   # already |grad|=1
    dx = 2.0 / (n - 1)
    h = 0.1 * dx

    def make_dense(steps):
        @jax.jit
        def run(p):
            r = reinit(p, dx, h, steps, 0.0)
            return jnp.sum(r.phi)
        return run

    def make_nb(steps):
        @jax.jit
        def run(p):
            # refresh_every=5 aligns the chunked iteration count with the
            # two-point step counts (SMALL_STEPS=5, BIG_STEPS=25)
            r = reinit_narrowband(p, dx, h, steps, 0.0, band_radius=8.1,
                                  refresh_every=5)
            return jnp.sum(r.phi)
        return run

    t_dense = per_step_time(make_dense, phi0)
    t_nb = per_step_time(make_nb, phi0)
    return t_dense / t_nb, n ** 3 / t_nb


def main():
    detail = {"device": jax.devices()[0].device_kind,
              "reps": REPS, "method": "min-of-reps, two-point overhead"
                                      " cancellation"}

    # north star (must succeed; jnp fallback inside reinit_fixed if the
    # fused kernel cannot compile in this environment)
    try:
        cups = bench_reinit_fwd(256)
    except Exception:
        from levelsetfortran_tpu.solvers.reinit import reinit_fixed
        phi0 = make_phi(256)
        dx = 2.0 / 255.0

        def make(steps):
            @jax.jit
            def run(p):
                return jnp.sum(reinit_fixed(p, dx, 0.1 * dx, steps,
                                            remat=False, use_pallas=False))
            return run

        cups = 256 ** 3 / per_step_time(make, make_phi(256))
    detail["reinit_fwd_256_cups"] = cups

    for name, fn in [
        ("reinit_bwd_256", lambda: bench_reinit_bwd(256)),
        ("reinit_fwd_512", lambda: bench_reinit_fwd(512)),
        ("minmax_256", lambda: bench_minmax(256)),
        ("narrowband_256", lambda: bench_narrowband(256)),
    ]:
        try:
            if name == "reinit_bwd_256":
                bwd, fwd, grad = fn()
                detail["reinit_bwd_256_cups"] = bwd
                detail["reinit_grad_256_cups"] = grad
                detail["bwd_over_fwd"] = bwd / fwd
            elif name == "narrowband_256":
                speedup, nb_cups = fn()
                detail["narrowband_speedup_256"] = speedup
                detail["reinit_nb_256_cups"] = nb_cups
            else:
                detail[name + "_cups"] = fn()
        except Exception as e:          # record, never fail the run
            detail[name + "_error"] = f"{type(e).__name__}: {e}"[:300]

    with open("BENCH_DETAIL.json", "w") as f:
        json.dump(detail, f, indent=2)

    print(json.dumps({
        "metric": "weno5_reinit_cell_updates_per_sec_2563",
        "value": cups,
        "unit": "cell-updates/s/chip",
        "vs_baseline": cups / SERIAL_BASELINE_CUPS,
    }))


if __name__ == "__main__":
    main()
