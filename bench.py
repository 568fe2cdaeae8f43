"""Benchmark entry point: WENO5+Godunov reinit cell-updates/sec at 256^3.

This is the BASELINE.json north-star metric ("WENO5 cell-updates/sec/chip at
256^3").  The reference publishes no numbers (BASELINE.md); ``vs_baseline``
is reported against a 2.0e7 cell-updates/s serial-CPU estimate for the
reference's per-point Gauss-Seidel WENO sweep (O(100) flops/cell on one core
— the reference is single-threaded by construction, README.md:19).

Prints exactly ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import jax
import jax.numpy as jnp

N = 256
DX = 2.0 / (N - 1)
WARMUP_STEPS = 2
BENCH_STEPS = 20
SERIAL_BASELINE_CUPS = 2.0e7   # estimated reference serial throughput


def make_phi():
    xs = jnp.linspace(-1.0, 1.0, N, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
    sphere = jnp.sqrt(gx * gx + gy * gy + gz * gz) - 0.6
    return 2.0 * sphere   # distorted: reinit has real work to do


def main():
    from levelsetfortran_tpu.solvers.reinit import reinit_fixed

    phi0 = make_phi()
    h = float(0.1 * DX)   # python scalar: no device constants in the jaxpr

    step_fn = jax.jit(
        lambda p, hh: reinit_fixed(p, DX, hh, BENCH_STEPS, remat=False))

    # warmup/compile
    step_fn(phi0, h).block_until_ready()

    t0 = time.perf_counter()
    out = step_fn(phi0, h)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    cell_updates = N ** 3 * BENCH_STEPS
    cups = cell_updates / dt
    print(json.dumps({
        "metric": "weno5_reinit_cell_updates_per_sec_2563",
        "value": cups,
        "unit": "cell-updates/s/chip",
        "vs_baseline": cups / SERIAL_BASELINE_CUPS,
    }))


if __name__ == "__main__":
    main()
