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


def per_step_time(make_run, phi0, small=SMALL_STEPS, big=BIG_STEPS):
    """Two-point overhead-cancelled per-step time."""
    t_small = timed_min(make_run(small), phi0)
    t_big = timed_min(make_run(big), phi0)
    return max((t_big - t_small) / (big - small), 1e-9)


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
    """Adjoint kernel GCUPS: in the flat-stash regime grad-of-scan costs
    (fwd scan with trajectory stash + bwd scan) = 1 fwd + 1 bwd per step;
    subtract the measured fwd slope.

    The flat-trajectory budget is raised for the measurement so BOTH
    two-point step counts stay in the flat-stash regime — at 256^3 the
    default 1.5 GB budget flips the 25-step run (1.8 GB of iterates) into
    sqrt-N checkpointing, whose extra recompute pass would contaminate
    the slope with ~1 forward step (the production default is unchanged;
    bench_checkpointed_grad measures the sqrt-N path itself)."""
    from levelsetfortran_tpu.ops import weno_pallas as wp
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

    saved = wp._FLAT_TRAJ_BYTES
    wp._FLAT_TRAJ_BYTES = max(saved, 4 * 2 ** 30)
    try:
        t_fwd = per_step_time(make_f, phi0)
        t_grad = per_step_time(make_g, phi0)
    finally:
        wp._FLAT_TRAJ_BYTES = saved
    # flat-stash regime: the forward scan stashes the trajectory, so the
    # gradient slope is 1 fwd + 1 bwd per step (no recompute pass)
    t_bwd = max(t_grad - t_fwd, 1e-9)
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

    # the min/max step is ~4x faster than reinit, so the default 20-step
    # two-point delta (~5 ms) sits inside dispatch noise — the source of
    # the r1->r2 +27% swing ADVICE.md flagged; 80 extra steps stabilize it
    return n ** 3 / per_step_time(make, phi0, small=20, big=100)


def bench_minmax_bwd(n):
    """Fused min/max ADJOINT kernel GCUPS (ops/minmax_pallas.py bwd kernel);
    same two-point decomposition (and flat-stash pinning) as
    bench_reinit_bwd, with the longer step counts of bench_minmax."""
    from levelsetfortran_tpu.ops import weno_pallas as wp
    from levelsetfortran_tpu.ops.minmax_pallas import minmax_scan_pallas
    phi0 = make_phi(n)
    dx = 2.0 / (n - 1)
    h1 = 0.01 * dx * dx

    def make_f(steps):
        @jax.jit
        def run(p):
            return jnp.sum(minmax_scan_pallas(p, dx, h1, steps))
        return run

    def make_g(steps):
        @jax.jit
        def run(p):
            grad = jax.grad(lambda q: jnp.sum(
                minmax_scan_pallas(q, dx, h1, steps)))(p)
            return jnp.sum(grad)
        return run

    saved = wp._FLAT_TRAJ_BYTES
    wp._FLAT_TRAJ_BYTES = max(saved, 8 * 2 ** 30)
    try:
        t_fwd = per_step_time(make_f, phi0, small=20, big=100)
        t_grad = per_step_time(make_g, phi0, small=20, big=100)
    finally:
        wp._FLAT_TRAJ_BYTES = saved
    # flat-stash regime: gradient slope = 1 fwd + 1 bwd (see above)
    t_bwd = max(t_grad - t_fwd, 1e-9)
    return n ** 3 / t_bwd, n ** 3 / t_fwd


def bench_checkpointed_grad(n, steps):
    """End-to-end gradient of a LONG fused-scan solve — the sqrt-N
    checkpointed reverse path (ops/weno_pallas.checkpointed_reverse) that
    keeps a 200-step 256^3 / 50-step 512^3 gradient inside a 16 GB chip
    (the flat trajectory stash would need ~15 GB / ~28 GB).  Reports
    end-to-end gradient GCUPS (cells * steps / total seconds) and the
    wall time of one full grad evaluation."""
    from levelsetfortran_tpu.ops.weno_pallas import reinit_scan_pallas
    phi0 = make_phi(n)
    dx = 2.0 / (n - 1)
    h = 0.1 * dx

    @jax.jit
    def run(p):
        grad = jax.grad(lambda q: jnp.sum(
            reinit_scan_pallas(q, dx, h, steps, precise=False)))(p)
        return jnp.sum(grad)

    val = float(run(phi0))                  # compile + correctness fence
    if not jnp.isfinite(val):
        raise FloatingPointError(f"non-finite gradient sum {val}")
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(phi0))
        best = min(best, time.perf_counter() - t0)
    return n ** 3 * steps / best, best


def bench_narrowband_flat(shape):
    """Narrow-band speedup on FLAT/SPARSE geometry (the twoCube10 class:
    two small bodies far apart along x, most tile columns never meet the
    band — ROOFLINE.md predicts reference-like narrow-band economics
    here, vs the ~2x skip bound for compact geometry).

    The fixture is sized comparably to the 256^3 compact case (12.6M
    cells) so the per-step work is well above dispatch noise, and the
    long axis stays in the TILED dims (identity layout: every axis is
    already lane/sublane aligned) where the activity mask can exploit
    its sparsity — see weno_pallas.banded_axis_order."""
    from levelsetfortran_tpu.solvers.reinit import reinit, reinit_narrowband
    nx, ny, nz = shape
    xs = jnp.linspace(-3.0, 3.0, nx, dtype=jnp.float32)
    ys = jnp.linspace(-0.5, 0.5, ny, dtype=jnp.float32)
    zs = jnp.linspace(-0.5, 0.5, nz, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")
    s1 = jnp.sqrt((gx + 2.5) ** 2 + gy ** 2 + gz ** 2) - 0.2
    s2 = jnp.sqrt((gx - 2.5) ** 2 + gy ** 2 + gz ** 2) - 0.2
    phi0 = jnp.minimum(s1, s2)
    dx = float(xs[1] - xs[0])
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
            r = reinit_narrowband(p, dx, h, steps, 0.0, band_radius=8.1,
                                  refresh_every=5)
            return jnp.sum(r.phi)
        return run

    t_dense = per_step_time(make_dense, phi0, small=10, big=50)
    t_nb = per_step_time(make_nb, phi0, small=10, big=50)
    return t_dense / t_nb


def bench_sharded_overhead(n):
    """Single-chip domain-decomposition overhead: the sharded solver
    (mesh (1,1,1): shard_map + halo pad + while_loop + RMS psum each step)
    vs the raw fused scan — quantifies what the sharded layer costs per
    step before any real ICI traffic (VERDICT r2 weak #8)."""
    from levelsetfortran_tpu.ops.weno_pallas import reinit_scan_pallas
    from levelsetfortran_tpu.parallel.mesh import make_mesh
    from levelsetfortran_tpu.parallel.sharded import ShardedLevelSet
    phi0 = make_phi(n)
    dx = 2.0 / (n - 1)
    h = 0.1 * dx
    mesh = make_mesh((1, 1, 1), jax.devices()[:1])
    solver = ShardedLevelSet(mesh, phi0.shape, dx)
    phi_dev = solver.device_put(phi0)

    def make_sharded(steps):
        def run(p):
            out, it, rms = solver.reinit(p, h, steps, 0.0)
            return float(jnp.sum(out[:16, :16, :16]))
        return run

    def make_direct(steps):
        @jax.jit
        def run(p):
            return jnp.sum(
                reinit_scan_pallas(p, dx, h, steps, precise=False))
        return run

    t_sh = per_step_time(make_sharded, phi_dev)
    t_di = per_step_time(make_direct, phi0)
    return t_sh / t_di, n ** 3 / t_sh


def bench_serving(n, batch, steps=50):
    """Batched-serving strategy measurement (VERDICT r3 weak #8, r4 #5):
    vmapped stacked program vs per-geometry sequential fused solves vs the
    PACKED fused kernel (all B geometries along x, one launch per step),
    at sizes straddling pipeline/batch.py's old 96^3 vmap/sequential
    crossover — the committed numbers justify the packed-first router."""
    from levelsetfortran_tpu.ops.weno_pallas import reinit_scan_pallas_packed
    from levelsetfortran_tpu.solvers.reinit import reinit_fixed, reinit_step
    xs = jnp.linspace(-1.0, 1.0, n, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
    base = jnp.sqrt(gx * gx + gy * gy + gz * gz)
    radii = jnp.linspace(0.4, 0.7, batch, dtype=jnp.float32)
    phis = jax.vmap(lambda r: 2.0 * (base - r))(radii)
    dx = 2.0 / (n - 1)
    h = jnp.float32(0.1 * dx)

    @jax.jit
    def batched(ps):
        def step(p, _):
            return jax.vmap(
                lambda q, s: reinit_step(q, s, dx, h))(p, ps), None
        out, _ = jax.lax.scan(step, ps, None, length=steps)
        return jnp.sum(out)

    @jax.jit
    def solo(p):
        return jnp.sum(reinit_fixed(p, dx, h, steps, remat=False))

    def sequential(ps):
        return sum(float(solo(ps[i])) for i in range(ps.shape[0]))

    @jax.jit
    def packed(ps):
        return jnp.sum(reinit_scan_pallas_packed(ps, dx, h, steps,
                                                 precise=False))

    t_vmap = timed_min(batched, phis)
    t_seq = timed_min(sequential, phis)
    t_packed = timed_min(packed, phis)
    return batch / t_vmap, batch / t_seq, batch / t_packed


def bench_banded_grad(n):
    """Differentiable narrow-band reinit (VERDICT r3 weak #4): gradient
    slope of the banded fused scan vs the dense fused scan on a
    converged sphere SDF (banded adjoint kernel skips frozen tiles'
    stencil adjoints)."""
    from levelsetfortran_tpu.ops.weno_pallas import (
        reinit_scan_pallas, reinit_scan_pallas_banded)
    xs = jnp.linspace(-1.0, 1.0, n, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
    phi0 = jnp.sqrt(gx * gx + gy * gy + gz * gz) - 0.6
    dx = 2.0 / (n - 1)
    h = 0.1 * dx

    def make_dense(steps):
        @jax.jit
        def run(p):
            g = jax.grad(lambda q: jnp.sum(
                reinit_scan_pallas(q, dx, h, steps, precise=False)))(p)
            return jnp.sum(g)
        return run

    def make_nb(steps):
        @jax.jit
        def run(p):
            g = jax.grad(lambda q: jnp.sum(
                reinit_scan_pallas_banded(q, dx, h, steps,
                                          refresh_every=5,
                                          axis_order=(0, 1, 2))))(p)
            return jnp.sum(g)
        return run

    t_d = per_step_time(make_dense, phi0, small=5, big=20)
    t_nb = per_step_time(make_nb, phi0, small=5, big=20)
    return t_d / t_nb, n ** 3 / t_nb


def bench_overlap_overhead(n):
    """Structural overhead of the exchange/compute-overlap step (VERDICT
    r3 missing #3 gate: <= 5% single-chip).  On a (1,1,1) mesh the
    ppermutes are no-ops, so overlap vs plain isolates the cost of the
    interior-rectangle + 4 shell-strip kernel launches replacing one
    launch — the structure must be ~free where latency is zero."""
    from levelsetfortran_tpu.parallel.mesh import make_mesh
    from levelsetfortran_tpu.parallel.sharded import ShardedLevelSet
    phi0 = make_phi(n)
    dx = 2.0 / (n - 1)
    h = 0.1 * dx
    mesh = make_mesh((1, 1, 1), jax.devices()[:1])
    plain = ShardedLevelSet(mesh, phi0.shape, dx)
    ov = ShardedLevelSet(mesh, phi0.shape, dx, overlap=True)

    def make(solver):
        def factory(steps):
            def run(p):
                out, it, rms = solver.reinit(p, h, steps, 0.0)
                return float(jnp.sum(out[:16, :16, :16]))
            return run
        return factory

    t_plain = per_step_time(make(plain), plain.device_put(phi0))
    t_ov = per_step_time(make(ov), ov.device_put(phi0))
    return t_ov / t_plain


def bench_sharded_grad(n, steps):
    """End-to-end gradient of the SHARDED fixed-step solve on the fused
    kernels (VERDICT r3 missing #1: per-shard Pallas forward + Pallas
    adjoint with adjoint halo exchange).  One real chip = a (1, 1, 1)
    mesh, so this measures the sharded reverse-mode machinery's overhead
    over the raw fused-scan gradient (bench_checkpointed_grad)."""
    from levelsetfortran_tpu.parallel.mesh import make_mesh
    from levelsetfortran_tpu.parallel.sharded import reinit_fixed_sharded
    phi0 = make_phi(n)
    dx = 2.0 / (n - 1)
    h = 0.1 * dx
    mesh = make_mesh((1, 1, 1), jax.devices()[:1])

    @jax.jit
    def run(p):
        grad = jax.grad(lambda q: jnp.sum(
            reinit_fixed_sharded(mesh, q, dx, h, steps,
                                 use_pallas=True)))(p)
        return jnp.sum(grad)

    val = float(run(phi0))
    if not jnp.isfinite(val):
        raise FloatingPointError(f"non-finite sharded gradient sum {val}")
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(phi0))
        best = min(best, time.perf_counter() - t0)
    return n ** 3 * steps / best, best


def bench_minmax_nb(n, flat=False):
    """Narrow-band min/max speedup (VERDICT r3 weak #1): dense fused
    kernel vs zero-copy tile-skipping banded kernel (ping-pong carry:
    inactive tiles move NO bytes).  The kernel is memory-bound, so the
    ceiling is the active-column fraction — a centered sphere's band
    shell projects onto the full enclosed disk (~69% of tiles at r=0.6),
    while the flat two-body fixture leaves most columns skippable."""
    from levelsetfortran_tpu.solvers.minmax_flow import (
        minmax_flow, minmax_flow_narrowband)
    if flat:
        nx, ny, nz = 768, 128, 128
        xs = jnp.linspace(-3.0, 3.0, nx, dtype=jnp.float32)
        ys = jnp.linspace(-0.5, 0.5, ny, dtype=jnp.float32)
        zs = jnp.linspace(-0.5, 0.5, nz, dtype=jnp.float32)
        gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")
        s1 = jnp.sqrt((gx + 2.5) ** 2 + gy ** 2 + gz ** 2) - 0.2
        s2 = jnp.sqrt((gx - 2.5) ** 2 + gy ** 2 + gz ** 2) - 0.2
        phi0 = jnp.minimum(s1, s2)
        dx = float(xs[1] - xs[0])
    else:
        xs = jnp.linspace(-1.0, 1.0, n, dtype=jnp.float32)
        gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
        phi0 = jnp.sqrt(gx * gx + gy * gy + gz * gz) - 0.6
        dx = 2.0 / (n - 1)
    h1 = 0.01 * dx * dx

    def make_dense(steps):
        @jax.jit
        def run(p):
            r = minmax_flow(p, dx, h1, steps, 0.0)
            return jnp.sum(r.phi)
        return run

    def make_nb(steps):
        @jax.jit
        def run(p):
            r = minmax_flow_narrowband(p, dx, h1, steps, 0.0,
                                       axis_order=(0, 1, 2))
            return jnp.sum(r.phi)
        return run

    t_dense = per_step_time(make_dense, phi0, small=20, big=100)
    # banded steps are far below the relay's run-to-run jitter, so the
    # two-point interval must be much wider to resolve them (the flat
    # fixture's banded step is ~us-scale: 100-20 steps measured ~0 and
    # the clamped divide reported a nonsense 1e5 ratio)
    t_nb = per_step_time(make_nb, phi0, small=20,
                         big=1020 if flat else 320)
    return t_dense / t_nb


def bench_init(n):
    """Init-stage cost on the BASELINE-class workload: n^3 grid, the
    bundled cube40 mesh (18,276 triangles).  Culled (per-block candidate
    gather, ops/init_sign.build_init_culling) vs the all-pairs double scan
    — the stage VERDICT r3 flagged as unbenchmarked and asymptotically
    worse than the reference's own subbox trick (set3d.f90:180-186)."""
    from levelsetfortran_tpu.grid.grid import Grid3D
    from levelsetfortran_tpu.io.stl import read_stl
    from levelsetfortran_tpu.ops.init_sign import (
        _dense_signed_distance_init, build_init_culling,
        signed_distance_init)
    mesh = read_stl("/root/reference/cube40.stl")
    lo, hi = mesh.vertices.min(0), mesh.vertices.max(0)
    span = float((hi - lo).max()) * 1.2
    dx = span / (n - 1)
    origin = tuple(float(c) for c in (lo + hi) / 2 - span / 2)
    grid = Grid3D(shape=(n, n, n), origin=origin, dx=dx)
    v = jnp.asarray(mesh.vertices, jnp.float32)
    e = jnp.asarray(mesh.elements)

    t0 = time.perf_counter()
    cull = build_init_culling(grid, v, e, block=16)
    t_build = time.perf_counter() - t0
    K = cull.max_k

    def run_culled(_):
        return jnp.sum(signed_distance_init(grid, v, e, dtype=jnp.float32,
                                            culling=cull))

    t_c = timed_min(run_culled, 0)

    # all-pairs baseline, measured in 8 x-slab sub-grids: a single flat
    # 256^3 execution (~2.5 min) exceeds what the tunneled worker survives;
    # the slabs share one compiled shape, so warm times sum to the real
    # all-pairs cost (+ ~ms of dispatch)
    nslab = 8
    sx = n // nslab

    def run_slab(i):
        sub = Grid3D(shape=(sx, n, n),
                     origin=(origin[0] + i * sx * dx, origin[1], origin[2]),
                     dx=dx)
        return float(jnp.sum(_dense_signed_distance_init(
            sub, v, e, dtype=jnp.float32)))

    run_slab(0)                       # compile once (shapes shared)
    t_d = 0.0
    for i in range(nslab):
        t0 = time.perf_counter()
        run_slab(i)
        t_d += time.perf_counter() - t0
    return t_c, t_d, t_build, K


def _cube40_grid(n):
    from levelsetfortran_tpu.grid.grid import Grid3D
    from levelsetfortran_tpu.io.stl import read_stl
    mesh = read_stl("/root/reference/cube40.stl")
    lo, hi = mesh.vertices.min(0), mesh.vertices.max(0)
    span = float((hi - lo).max()) * 1.2
    dx = span / (n - 1)
    origin = tuple(float(c) for c in (lo + hi) / 2 - span / 2)
    return Grid3D(shape=(n, n, n), origin=origin, dx=dx), mesh


def bench_sharded_banded_grad(n, steps):
    """Banded x sharded x differentiable product (VERDICT r4 next #4):
    the fixed-step sharded reverse mode with narrow-band tile skipping in
    BOTH sweeps, vs its dense counterpart (bench_sharded_grad)."""
    from levelsetfortran_tpu.parallel.mesh import make_mesh
    from levelsetfortran_tpu.parallel.sharded import reinit_fixed_sharded
    phi0 = jnp.sqrt(jnp.sum(jnp.stack(jnp.meshgrid(
        *([jnp.linspace(-1.0, 1.0, n, dtype=jnp.float32)] * 3),
        indexing="ij")) ** 2, axis=0)) - 0.6
    dx = 2.0 / (n - 1)
    h = 0.1 * dx
    mesh = make_mesh()

    @jax.jit
    def run(p):
        grad = jax.grad(lambda q: jnp.sum(
            reinit_fixed_sharded(mesh, q, dx, h, steps, use_pallas=True,
                                 band_radius=8.1, refresh_every=8)))(p)
        return jnp.sum(grad)

    val = float(run(phi0))
    if not jnp.isfinite(val):
        raise FloatingPointError(f"non-finite banded sharded grad {val}")
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(phi0))
        best = min(best, time.perf_counter() - t0)
    return n ** 3 * steps / best, best


def bench_scaling_single(block=256):
    """benchmarks/scaling.py's weak-scaling datum on THIS chip, recorded
    so the scaling harness's own numbers are regression-tracked
    (VERDICT r4 next #7): per-chip step rate at k=1 and the k=2
    halo-deep variant (its wider-halo compute overhead is the single-chip
    cost the PARALLEL.md efficiency model charges against saved message
    latency)."""
    from benchmarks.scaling import measure, sphere
    from levelsetfortran_tpu.parallel.mesh import make_mesh
    from levelsetfortran_tpu.parallel.sharded import ShardedLevelSet
    mesh = make_mesh((1, 1, 1), jax.devices()[:1])
    gshape = (block,) * 3
    dx = 2.0 / (block - 1)
    phi0 = sphere(gshape)
    out = {}
    for k in (1, 2):
        s = ShardedLevelSet(mesh, gshape, dx, steps_per_exchange=k)
        per = -1.0
        for _ in range(3):           # relay hiccups can invert two-point
            per = measure(s, phi0, 0.1 * dx)
            if per > 0:
                break
        out[k] = 1.0 / per if per > 0 else float("nan")
    return out


def bench_e2e_pixgrad(n, reinit_steps=50, minmax_steps=20, hw=64):
    """BASELINE config-5 chain END TO END (VERDICT r4 missing #2): one
    pixels->vertices value_and_grad through culled init + fixed-step
    reinit + min/max smoothing + the sphere-traced renderer, on the
    cube40 mesh at n^3, plus a per-stage FORWARD decomposition so the
    dominating stage is data, not a guess."""
    import numpy as np
    from levelsetfortran_tpu.ops.init_sign import (build_init_culling,
                                                   signed_distance_init)
    from levelsetfortran_tpu.pipeline.differentiable import (
        image_loss_and_vertex_grad, render_from_vertices)
    from levelsetfortran_tpu.render.sphere_trace import camera_rays, render
    from levelsetfortran_tpu.solvers.minmax_flow import minmax_flow_fixed
    from levelsetfortran_tpu.solvers.reinit import reinit_fixed
    grid, mesh = _cube40_grid(n)
    v = jnp.asarray(mesh.vertices, jnp.float32)
    e = jnp.asarray(mesh.elements)
    t0 = time.perf_counter()
    cull = build_init_culling(grid, np.asarray(mesh.vertices),
                              np.asarray(mesh.elements), block=16)
    t_build = time.perf_counter() - t0
    kw = dict(eye=(0.0, -3.0, 0.0), target=(0.0, 0.0, 0.0),
              reinit_steps=reinit_steps, minmax_steps=minmax_steps,
              height=hw, width=hw, culling=cull)
    target = jnp.zeros((hw, hw), jnp.float32)

    @jax.jit
    def run(vv, cull_arg):
        # culling passed as an ARGUMENT: closure-captured index tables
        # become jaxpr constants and ship with every compile payload
        loss, g = image_loss_and_vertex_grad(
            vv, e, grid, target, **dict(kw, culling=cull_arg))
        return loss + jnp.sum(g)

    t_total = timed_min(run, v, cull)

    # forward stage decomposition (each stage timed on its own inputs)
    dx = grid.dx
    f_init = jax.jit(lambda vv: jnp.sum(signed_distance_init(
        grid, vv, e, dtype=jnp.float32, culling=cull)))
    t_init = timed_min(f_init, v)
    phi0 = signed_distance_init(grid, v, e, dtype=jnp.float32, culling=cull)
    f_re = jax.jit(lambda p: jnp.sum(reinit_fixed(
        p, dx, 0.1 * dx, reinit_steps, remat=False)))
    t_re = timed_min(f_re, phi0)
    phi1 = reinit_fixed(phi0, dx, 0.1 * dx, reinit_steps, remat=False)
    f_mm = jax.jit(lambda p: jnp.sum(minmax_flow_fixed(
        p, dx, 0.01 * dx * dx, minmax_steps)))
    t_mm = timed_min(f_mm, phi1)
    phi2 = minmax_flow_fixed(phi1, dx, 0.01 * dx * dx, minmax_steps)
    origins, dirs = camera_rays(hw, hw, eye=kw["eye"], target=kw["target"],
                                dtype=phi2.dtype)
    f_rd = jax.jit(lambda p: jnp.sum(render(
        p, grid, origins, dirs, n_steps=64, hit_tol=0.25 * dx).image))
    t_rd = timed_min(f_rd, phi2)
    return dict(total=t_total, build=t_build, init_fwd=t_init,
                reinit_fwd=t_re, minmax_fwd=t_mm, render_fwd=t_rd)


def bench_e2e_pixgrad_sharded(n, reinit_steps=20, minmax_steps=10, hw=64):
    """The 512-class sharded variant of the config-5 chain on the 1-chip
    device mesh (3D decomposition machinery engaged; ICI-free)."""
    import numpy as np
    from levelsetfortran_tpu.ops.init_sign import build_init_culling
    from levelsetfortran_tpu.parallel.mesh import make_mesh
    from levelsetfortran_tpu.pipeline.differentiable import (
        image_loss_and_vertex_grad)
    grid, mesh_ = _cube40_grid(n)
    v = jnp.asarray(mesh_.vertices, jnp.float32)
    e = jnp.asarray(mesh_.elements)
    cull = build_init_culling(grid, np.asarray(mesh_.vertices),
                              np.asarray(mesh_.elements), block=16,
                              bucketed=False)
    dev_mesh = make_mesh()
    target = jnp.zeros((hw, hw), jnp.float32)
    kw = dict(eye=(0.0, -3.0, 0.0), target=(0.0, 0.0, 0.0),
              reinit_steps=reinit_steps, minmax_steps=minmax_steps,
              height=hw, width=hw, culling=cull, mesh=dev_mesh)

    @jax.jit
    def run(vv, cull_arg):
        loss, g = image_loss_and_vertex_grad(
            vv, e, grid, target, **dict(kw, culling=cull_arg))
        return loss + jnp.sum(g)

    return timed_min(run, v, cull)


def bench_advect(n, iters=1000):
    """Forward node-advection cost (VERDICT r4 weak #7: zero perf
    visibility): the reference's 1000-iteration trilinear walk
    (set3d.f90:489-501) vectorized over the cube40 mesh's nodes on an
    n^3 smoothed field."""
    from levelsetfortran_tpu.solvers.advect import advect_nodes
    grid, mesh = _cube40_grid(n)
    xs = jnp.linspace(-1.0, 1.0, n, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
    phi = jnp.sqrt(gx * gx + gy * gy + gz * gz) - 0.6
    pos = jnp.asarray(mesh.vertices, jnp.float32) * 0.6  # near the sphere

    def make(it):
        @jax.jit
        def run(p, x):
            r = advect_nodes(p, grid, x, grid.dx, iters=it)
            return jnp.sum(r.positions)
        return run

    small, big = make(100), make(100 + iters)
    t_small = timed_min(small, phi, pos)
    t_big = timed_min(big, phi, pos)
    return max(t_big - t_small, 1e-9), pos.shape[0]


def bench_render(n, hw=256):
    """Forward sphere-traced render throughput (VERDICT r4 weak #7)."""
    from levelsetfortran_tpu.render.sphere_trace import camera_rays, render
    grid, _ = _cube40_grid(n)
    xs = jnp.linspace(grid.origin[0], grid.origin[0] + (n - 1) * grid.dx,
                      n, dtype=jnp.float32)
    gx, gy, gz = jnp.meshgrid(xs, xs, xs, indexing="ij")
    phi = jnp.sqrt(gx * gx + gy * gy + gz * gz) - 0.7
    origins, dirs = camera_rays(hw, hw, eye=(0.0, -3.0, 0.0),
                                target=(0.0, 0.0, 0.0), dtype=phi.dtype)

    @jax.jit
    def run(p):
        out = render(p, grid, origins, dirs, n_steps=64,
                     hit_tol=0.25 * grid.dx)
        return jnp.sum(out.image)

    t = timed_min(run, phi)
    return t, hw * hw / t


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
            # refresh_every=9 -> chunk length 9 (1 passthrough + 4 pairs);
            # the two-point counts below are whole chunks so the measured
            # slope is exactly per-step
            r = reinit_narrowband(p, dx, h, steps, 0.0, band_radius=8.1,
                                  refresh_every=9)
            return jnp.sum(r.phi)
        return run

    t_dense = per_step_time(make_dense, phi0)
    t_nb = per_step_time(make_nb, phi0, small=9, big=45)
    return t_dense / t_nb, n ** 3 / t_nb


def main():
    detail = {"device": jax.devices()[0].device_kind,
              "reps": REPS, "method": "min-of-reps, two-point overhead"
                                      " cancellation",
              "note": "timings go through the axon relay on a shared host;"
                      " min-of-reps still carries ~5-10% run-to-run spread"
                      " — treat cross-round deltas below that as noise"}

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
        ("minmax_bwd_256", lambda: bench_minmax_bwd(256)),
        ("narrowband_256", lambda: bench_narrowband(256)),
        ("narrowband_flat", lambda: bench_narrowband_flat((768, 128, 128))),
        ("grad200_256", lambda: bench_checkpointed_grad(256, 200)),
        ("grad50_512", lambda: bench_checkpointed_grad(512, 50)),
        ("sharded_1chip", lambda: bench_sharded_overhead(256)),
        ("init_256", lambda: bench_init(256)),
        ("minmax_nb_256", lambda: bench_minmax_nb(256)),
        ("minmax_nb_flat", lambda: bench_minmax_nb(0, flat=True)),
        ("sharded_grad200_256", lambda: bench_sharded_grad(256, 200)),
        ("sharded_grad_nb_256",
         lambda: bench_sharded_banded_grad(256, 200)),
        ("sharded_grad50_512", lambda: bench_sharded_grad(512, 50)),
        ("overlap_overhead_256", lambda: bench_overlap_overhead(256)),
        ("grad_nb_256", lambda: bench_banded_grad(256)),
        ("serving_64", lambda: bench_serving(64, 8)),
        ("serving_96", lambda: bench_serving(96, 4)),
        ("serving_128", lambda: bench_serving(128, 2)),
        ("e2e_pixgrad_256", lambda: bench_e2e_pixgrad(256)),
        # 384+ crashes the tunneled worker (compile-memory/HBM limits of
        # the single chip behind the relay); 256 exercises the same
        # sharded init+reinit+minmax+render reverse-mode composition
        ("e2e_pixgrad_256_sharded",
         lambda: bench_e2e_pixgrad_sharded(256)),
        ("advect_256", lambda: bench_advect(256)),
        ("scaling_single", lambda: bench_scaling_single(256)),
        ("render_256", lambda: bench_render(256)),
    ]:
        try:
            if name == "reinit_bwd_256":
                bwd, fwd, grad = fn()
                detail["reinit_bwd_256_cups"] = bwd
                detail["reinit_grad_256_cups"] = grad
                detail["bwd_over_fwd"] = bwd / fwd
            elif name == "minmax_bwd_256":
                bwd, fwd = fn()
                detail["minmax_bwd_256_cups"] = bwd
                detail["minmax_bwd_over_fwd"] = bwd / fwd
            elif name == "narrowband_256":
                speedup, nb_cups = fn()
                detail["narrowband_speedup_256"] = speedup
                detail["reinit_nb_256_cups"] = nb_cups
            elif name == "narrowband_flat":
                detail["narrowband_speedup_flat_768x128x128"] = fn()
            elif name == "grad_nb_256":
                nb_ratio, nb_cups = fn()
                detail["grad_nb_256_speedup"] = nb_ratio
                detail["grad_nb_256_cups"] = nb_cups
            elif name.startswith("grad"):
                g_cups, g_secs = fn()      # NB: never rebind `cups`
                detail[name + "_cups"] = g_cups
                detail[name + "_seconds"] = g_secs
            elif name == "sharded_1chip":
                # NB: do not rebind `cups` (the north-star value)
                sh_ratio, sh_cups = fn()
                detail["sharded_1chip_overhead"] = sh_ratio
                detail["sharded_1chip_cups"] = sh_cups
            elif name == "init_256":
                i_c, i_d, i_build, i_k = fn()
                detail["init_256_cube40mesh_seconds"] = i_c
                detail["init_256_cube40mesh_allpairs_seconds"] = i_d
                detail["init_256_cube40mesh_speedup"] = i_d / i_c
                detail["init_256_cube40mesh_cull_build_seconds"] = i_build
                detail["init_256_cube40mesh_cand_k"] = i_k
            elif name.startswith("minmax_nb"):
                detail[name + "_speedup"] = fn()
            elif name.startswith("sharded_grad"):
                sg_cups, sg_secs = fn()
                detail[name + "_cups"] = sg_cups
                detail[name + "_seconds"] = sg_secs
                if name == "sharded_grad_nb_256" and \
                        "sharded_grad200_256_seconds" in detail:
                    detail["sharded_grad_nb_256_speedup"] = (
                        detail["sharded_grad200_256_seconds"] / sg_secs)
            elif name == "overlap_overhead_256":
                detail[name] = fn()
            elif name == "e2e_pixgrad_256":
                st = fn()
                detail["e2e_pixgrad_256_seconds"] = st["total"]
                for k in ("build", "init_fwd", "reinit_fwd", "minmax_fwd",
                          "render_fwd"):
                    detail[f"e2e_256_stage_{k}_seconds"] = st[k]
            elif name == "e2e_pixgrad_256_sharded":
                detail["e2e_pixgrad_256_sharded_seconds"] = fn()
            elif name == "advect_256":
                a_t, a_nodes = fn()
                detail["advect_1000iter_256_seconds"] = a_t
                detail["advect_node_updates_per_sec"] = a_nodes * 1000 / a_t
            elif name == "scaling_single":
                sc = fn()
                detail["scaling_weak_block256_steps_per_sec_k1"] = sc[1]
                detail["scaling_weak_block256_steps_per_sec_k2"] = sc[2]
            elif name == "render_256":
                r_t, r_pps = fn()
                detail["render_256x256_at_256grid_seconds"] = r_t
                detail["render_pixels_per_sec"] = r_pps
            elif name.startswith("serving_"):
                v_gps, s_gps, p_gps = fn()
                detail[name + "_vmap_gps"] = v_gps
                detail[name + "_sequential_gps"] = s_gps
                detail[name + "_vmap_speedup"] = v_gps / s_gps
                detail[name + "_packed_gps"] = p_gps
                detail[name + "_packed_speedup"] = p_gps / max(v_gps, s_gps)
            else:
                detail[name + "_cups"] = fn()
        except Exception as e:          # record, never fail the run
            detail[name + "_error"] = f"{type(e).__name__}: {e}"[:300]

    with open("BENCH_DETAIL.json", "w") as f:
        json.dump(detail, f, indent=2)
        f.write("\n")

    # keep README's generated measured-numbers block in lockstep with the
    # fresh BENCH_DETAIL (tests/test_docs.py gates on the two matching)
    try:
        import os
        import subprocess
        subprocess.run(
            ["python", os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "tools",
                "update_readme_bench.py")],
            check=True, capture_output=True)
    except Exception:
        pass                               # never fail the bench run

    print(json.dumps({
        "metric": "weno5_reinit_cell_updates_per_sec_2563",
        "value": cups,
        "unit": "cell-updates/s/chip",
        "vs_baseline": cups / SERIAL_BASELINE_CUPS,
    }))


if __name__ == "__main__":
    main()
