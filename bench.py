"""Benchmark entry point: WENO5+Godunov reinit cell-updates/sec at 256^3.

This is the BASELINE.json north-star metric ("WENO5 cell-updates/sec/chip at
256^3").  The reference publishes no numbers (BASELINE.md); ``vs_baseline``
is reported against a 2.0e7 cell-updates/s serial-CPU estimate for the
reference's per-point Gauss-Seidel WENO sweep (O(400) flops/cell on one
core — the reference is single-threaded by construction, README.md:19).

Measurement notes (this environment): device dispatch through the axon
relay is asynchronous and ``block_until_ready`` may return before the work
finishes, so each timed region is closed by fetching a scalar reduction of
the result; a warmup fetch first amortizes the one-time device->host
transfer setup.

Prints exactly ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import jax
import jax.numpy as jnp

N = 256
DX = 2.0 / (N - 1)
WARMUP_STEPS = 5
BENCH_STEPS = 40
SERIAL_BASELINE_CUPS = 2.0e7   # estimated reference serial throughput


def make_phi():
    xs = jnp.linspace(-1.0, 1.0, N, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
    sphere = jnp.sqrt(gx * gx + gy * gy + gz * gz) - 0.6
    return 2.0 * sphere   # distorted: reinit has real work to do


def bench_steps(runner, phi0, h):
    """Time a compiled runner, forcing completion via a scalar fetch."""
    float(runner(phi0, h))          # warmup: compile + first-fetch setup
    t0 = time.perf_counter()
    float(runner(phi0, h))          # forces execution + result readback
    return time.perf_counter() - t0


def run_pair(phi0, h, use_pallas):
    from levelsetfortran_tpu.solvers.reinit import reinit_fixed

    def make(steps):
        @jax.jit
        def run(p, hh):
            return jnp.sum(reinit_fixed(p, DX, hh, steps, remat=False,
                                        use_pallas=use_pallas))
        return run

    return (bench_steps(make(WARMUP_STEPS), phi0, h),
            bench_steps(make(BENCH_STEPS), phi0, h))


def main():
    phi0 = make_phi()
    h = float(0.1 * DX)

    # subtract fixed overhead using two step counts; if the fused Pallas
    # kernel cannot compile in this environment, fall back to the jnp path
    # rather than failing the benchmark run
    try:
        t_small, t_big = run_pair(phi0, h, "auto")
    except Exception:
        t_small, t_big = run_pair(phi0, h, False)
    per_step = (t_big - t_small) / (BENCH_STEPS - WARMUP_STEPS)
    per_step = max(per_step, 1e-9)

    cups = N ** 3 / per_step
    print(json.dumps({
        "metric": "weno5_reinit_cell_updates_per_sec_2563",
        "value": cups,
        "unit": "cell-updates/s/chip",
        "vs_baseline": cups / SERIAL_BASELINE_CUPS,
    }))


if __name__ == "__main__":
    main()
