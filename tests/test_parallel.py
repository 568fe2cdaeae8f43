"""Sharded-vs-single-device equivalence on an 8-way virtual CPU mesh.

SURVEY.md §4: multi-host behavior is tested the standard JAX way — 8 virtual
CPU devices (conftest sets ``--xla_force_host_platform_device_count=8``),
``shard_map`` over a (2,2,2) mesh, asserting halo-exchange equivalence with
the unsharded single-device result.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from levelsetfortran_tpu.grid.grid import Grid3D
from levelsetfortran_tpu.models.analytic import sdf_sphere
from levelsetfortran_tpu.parallel.mesh import factor3, make_mesh
from levelsetfortran_tpu.parallel.sharded import ShardedLevelSet, dryrun
from levelsetfortran_tpu.solvers.minmax_flow import minmax_step
from levelsetfortran_tpu.solvers.reinit import reinit_step


def make_phi(n=16, dx=0.1, dtype=jnp.float32):
    grid = Grid3D(shape=(n, n, n), origin=(-(n - 1) * dx / 2,) * 3, dx=dx)
    phi = 2.0 * sdf_sphere(grid.coords(dtype), (0, 0, 0), 0.5)
    return grid, phi


class TestFactor3:
    def test_factors(self):
        assert sorted(factor3(8)) == [2, 2, 2]
        assert sorted(factor3(4)) == [1, 2, 2]
        assert sorted(factor3(2)) == [1, 1, 2]
        assert factor3(1) == (1, 1, 1)
        assert np.prod(factor3(6)) == 6

    def test_prefer_z1(self):
        """Kernel-compatible factorization: z never sharded, x*y near
        square (VERDICT r2 weak #5)."""
        for n in range(1, 17):
            shape = factor3(n, prefer_z1=True)
            assert shape[2] == 1 and np.prod(shape) == n
        assert factor3(8, prefer_z1=True) == (4, 2, 1)
        assert factor3(16, prefer_z1=True) == (4, 4, 1)
        assert factor3(7, prefer_z1=True) == (7, 1, 1)


def test_auto_mesh_admits_fused_kernel(eight_devices):
    """auto_mesh over 8 devices picks (4,2,1) when the kernel applies and
    the resulting ShardedLevelSet routes to the fused Pallas path."""
    mesh = ShardedLevelSet.auto_mesh((64, 32, 16), jnp.float32,
                                     eight_devices, use_pallas=True)
    assert tuple(mesh.devices.shape) == (4, 2, 1)
    solver = ShardedLevelSet(mesh, (64, 32, 16), 0.05, use_pallas=True)
    assert solver.use_pallas
    # kernel-inapplicable dtype keeps the balanced 3D factorization
    mesh64 = ShardedLevelSet.auto_mesh((64, 32, 16), jnp.float64,
                                       eight_devices, use_pallas=True)
    assert sorted(mesh64.devices.shape) == [2, 2, 2]


class TestShardedEquivalence:
    @pytest.mark.parametrize("mesh_shape", [(2, 2, 2), (4, 2, 1), (1, 2, 4)])
    def test_reinit_step_matches_single_device(self, eight_devices,
                                               mesh_shape):
        grid, phi = make_phi(16, 0.1)
        h = 0.01
        mesh = make_mesh(mesh_shape, eight_devices)
        solver = ShardedLevelSet(mesh, phi.shape, grid.dx)
        sharded = solver.reinit_step(solver.device_put(phi), phi, h)
        single = reinit_step(phi, phi, grid.dx, h)
        np.testing.assert_allclose(np.asarray(jax.device_get(sharded)),
                                   np.asarray(single), atol=2e-6)

    def test_multi_step_reinit_matches(self, eight_devices):
        grid, phi = make_phi(16, 0.1)
        mesh = make_mesh((2, 2, 2), eight_devices)
        solver = ShardedLevelSet(mesh, phi.shape, grid.dx)
        out, n, rms = solver.reinit(solver.device_put(phi), 0.01, 10, 0.0)
        # single-device: same 10 Jacobi steps
        ref = phi
        for _ in range(10):
            ref = reinit_step(ref, phi, grid.dx, 0.01)
        np.testing.assert_allclose(np.asarray(jax.device_get(out)),
                                   np.asarray(ref), atol=1e-5)
        assert int(n) == 10

    def test_minmax_step_matches(self, eight_devices):
        grid, phi = make_phi(16, 0.1)
        mesh = make_mesh((2, 2, 2), eight_devices)
        solver = ShardedLevelSet(mesh, phi.shape, grid.dx)
        out, n, rms = solver.minmax_flow(solver.device_put(phi), 0.001, 1, 0.0)
        ref = minmax_step(phi, grid.dx, 0.001)
        np.testing.assert_allclose(np.asarray(jax.device_get(out)),
                                   np.asarray(ref), atol=2e-6)


class TestOverlapEquivalence:
    """Exchange-overlapped step == plain exchanged step == single device.

    ``reinit_step_local_overlap`` computes the interior from local data
    (concurrent with the ppermute) and recomputes only shard-face shells
    from the exchanged pad; the decomposition must be invisible in the
    result (bitwise up to f32 reassociation).
    """

    @pytest.mark.parametrize("mesh_shape", [(2, 2, 2), (4, 2, 1), (1, 2, 4)])
    def test_overlap_step_matches_single_device(self, eight_devices,
                                                mesh_shape):
        grid, phi = make_phi(16, 0.1)
        h = 0.01
        mesh = make_mesh(mesh_shape, eight_devices)
        solver = ShardedLevelSet(mesh, phi.shape, grid.dx, overlap=True)
        sharded = solver.reinit_step(solver.device_put(phi), phi, h)
        single = reinit_step(phi, phi, grid.dx, h)
        np.testing.assert_allclose(np.asarray(jax.device_get(sharded)),
                                   np.asarray(single), atol=2e-6)

    def test_overlap_solver_matches_plain(self, eight_devices):
        grid, phi = make_phi(24, 0.1)
        mesh = make_mesh((2, 2, 2), eight_devices)
        plain = ShardedLevelSet(mesh, phi.shape, grid.dx)
        over = ShardedLevelSet(mesh, phi.shape, grid.dx, overlap=True)
        out_p, n_p, _ = plain.reinit(plain.device_put(phi), 0.01, 8, 0.0)
        out_o, n_o, _ = over.reinit(over.device_put(phi), 0.01, 8, 0.0)
        assert int(n_p) == int(n_o) == 8
        np.testing.assert_allclose(np.asarray(jax.device_get(out_o)),
                                   np.asarray(jax.device_get(out_p)),
                                   atol=1e-6)


class TestDryrun:
    @pytest.mark.slow
    def test_dryrun_8(self, eight_devices):
        dryrun(8)

    @pytest.mark.slow
    def test_dryrun_1(self):
        dryrun(1)


def test_halo_deep_pipelining_matches_single_device(eight_devices):
    """k local steps per width-3k exchange == k single-exchange steps."""
    import numpy as np
    from levelsetfortran_tpu.parallel.mesh import make_mesh
    from levelsetfortran_tpu.parallel.sharded import ShardedLevelSet
    from levelsetfortran_tpu.solvers.reinit import reinit_fixed

    n = (32, 32, 32)
    xs = [np.linspace(-1.2, 1.2, k) for k in n]
    gx, gy, gz = np.meshgrid(*xs, indexing="ij")
    phi0 = jnp.asarray(
        (2.0 * (np.sqrt(gx**2 + gy**2 + gz**2) - 0.6)).astype(np.float32))
    dx = 2.4 / 31
    h = 0.1 * dx
    ref = np.asarray(reinit_fixed(phi0, dx, h, 6, remat=False,
                                  use_pallas=False))
    mesh = make_mesh((2, 2, 2), eight_devices)
    for k in (2, 3):
        s = ShardedLevelSet(mesh, n, dx, steps_per_exchange=k)
        out, it, _ = s.reinit(s.device_put(phi0), h, iters=6, tol=0.0)
        assert int(it) == 6
        np.testing.assert_allclose(np.asarray(jax.device_get(out)), ref,
                                   atol=2e-6)


def test_sharded_pallas_blocks_match_single_device(eight_devices):
    """Local block steps run the fused Pallas kernel (interpret mode on
    CPU) over a 2D (x, y) decomposition; owned cells match the jnp
    single-device solver."""
    import numpy as np
    from levelsetfortran_tpu.parallel.mesh import make_mesh
    from levelsetfortran_tpu.parallel.sharded import ShardedLevelSet
    from levelsetfortran_tpu.solvers.reinit import reinit_fixed

    n = (32, 32, 16)
    xs = [np.linspace(-1.2, 1.2, k) for k in n]
    gx, gy, gz = np.meshgrid(*xs, indexing="ij")
    phi0 = jnp.asarray(
        (2.0 * (np.sqrt(gx**2 + gy**2 + gz**2) - 0.6)).astype(np.float32))
    dx = 2.4 / 31
    h = 0.1 * dx
    ref = np.asarray(reinit_fixed(phi0, dx, h, 4, remat=False,
                                  use_pallas=False))
    mesh = make_mesh((4, 2, 1), eight_devices)
    s = ShardedLevelSet(mesh, n, dx, use_pallas=True)
    assert s.use_pallas, "pallas mode should be applicable here"
    out, it, _ = s.reinit(s.device_put(phi0), h, iters=4, tol=0.0)
    assert int(it) == 4
    np.testing.assert_allclose(np.asarray(jax.device_get(out)), ref,
                               atol=2e-6)


def test_sharded_pallas_minmax_matches_single_device(eight_devices):
    import numpy as np
    from levelsetfortran_tpu.parallel.mesh import make_mesh
    from levelsetfortran_tpu.parallel.sharded import ShardedLevelSet
    from levelsetfortran_tpu.solvers.minmax_flow import minmax_flow

    n = (32, 32, 16)
    xs = [np.linspace(-1.2, 1.2, k) for k in n]
    gx, gy, gz = np.meshgrid(*xs, indexing="ij")
    phi0 = jnp.asarray(
        (np.sqrt(gx**2 + gy**2 + gz**2) - 0.6).astype(np.float32))
    dx = 2.4 / 31
    h1 = 0.05 * dx * dx
    ref = minmax_flow(phi0, dx, h1, 6, 0.0, use_pallas=False)
    mesh = make_mesh((4, 2, 1), eight_devices)
    s = ShardedLevelSet(mesh, n, dx, use_pallas=True)
    assert s.use_pallas
    out, it, _ = s.minmax_flow(s.device_put(phi0), h1, 6, 0.0)
    assert int(it) == 6
    np.testing.assert_allclose(np.asarray(jax.device_get(out)),
                               np.asarray(ref.phi), atol=2e-6)


def test_sharded_pallas_k2_matches_single_device(eight_devices):
    """Halo-deep pipelining composes with the fused kernel: k=2 fused steps
    per widened (tile-multiple) exchange; owned cells match the jnp
    single-device solver."""
    import numpy as np
    from levelsetfortran_tpu.parallel.mesh import make_mesh
    from levelsetfortran_tpu.parallel.sharded import ShardedLevelSet
    from levelsetfortran_tpu.solvers.reinit import reinit_fixed

    n = (32, 64, 16)
    xs = [np.linspace(-1.2, 1.2, k) for k in n]
    gx, gy, gz = np.meshgrid(*xs, indexing="ij")
    phi0 = jnp.asarray(
        (2.0 * (np.sqrt(gx**2 + gy**2 + gz**2) - 0.6)).astype(np.float32))
    dx = 2.4 / 31
    h = 0.1 * dx
    ref = np.asarray(reinit_fixed(phi0, dx, h, 4, remat=False,
                                  use_pallas=False))
    mesh = make_mesh((2, 2, 1), eight_devices[:4])
    s = ShardedLevelSet(mesh, n, dx, use_pallas=True, steps_per_exchange=2)
    assert s.use_pallas, "pallas k=2 should be applicable here"
    out, it, _ = s.reinit(s.device_put(phi0), h, iters=4, tol=0.0)
    assert int(it) == 4
    np.testing.assert_allclose(np.asarray(jax.device_get(out)), ref,
                               atol=2e-6)


def test_sharded_pallas_fallback_is_logged(eight_devices, caplog):
    """A requested-but-denied Pallas route leaves use_pallas False and emits
    a structured pallas_fallback event with reasons."""
    import logging
    from levelsetfortran_tpu.parallel.mesh import make_mesh
    from levelsetfortran_tpu.parallel.sharded import ShardedLevelSet

    mesh = make_mesh((2, 2, 2), eight_devices)    # z sharded -> unsupported
    with caplog.at_level(logging.INFO, logger="levelsetfortran_tpu"):
        s = ShardedLevelSet(mesh, (16, 16, 16), 0.1, use_pallas=True)
    assert not s.use_pallas
    assert any("pallas_fallback" in r.message for r in caplog.records)


def test_sharded_narrowband_matches_dense_in_band(eight_devices):
    """Narrow-band tile skipping composed with the domain decomposition
    (VERDICT r2 weak #4): in-band cells match the dense sharded solve;
    far-field cells are frozen or dense; freezing actually occurs."""
    import numpy as np
    from levelsetfortran_tpu.parallel.mesh import make_mesh
    from levelsetfortran_tpu.parallel.sharded import ShardedLevelSet

    n = (96, 32, 16)
    xs = [np.linspace(-1, 1, k) for k in n]
    gx, gy, gz = np.meshgrid(*xs, indexing="ij")
    phi0 = jnp.asarray(
        (np.sqrt(gx**2 + (0.3 * gy)**2 + (0.3 * gz)**2) - 0.3).astype(
            np.float32))
    dx = 2.0 / (n[0] - 1)
    h = 0.1 * dx
    band = 8.1
    mesh = make_mesh((4, 2, 1), eight_devices)
    dense_s = ShardedLevelSet(mesh, n, dx, use_pallas=True)
    nb_s = ShardedLevelSet(mesh, n, dx, use_pallas=True, narrow_band=True,
                           band_radius=band)
    assert dense_s.use_pallas and nb_s.use_pallas
    dense, it_d, _ = dense_s.reinit(dense_s.device_put(phi0), h, 4, 0.0)
    nb, it_n, _ = nb_s.reinit(nb_s.device_put(phi0), h, 4, 0.0)
    assert int(it_d) == int(it_n) == 4
    d = np.asarray(jax.device_get(dense))
    nbv = np.asarray(jax.device_get(nb))
    p0 = np.asarray(phi0)
    in_band = np.abs(p0) < band * dx
    np.testing.assert_allclose(nbv[in_band], d[in_band], atol=5e-6)
    resid = np.minimum(np.abs(nbv - d), np.abs(nbv - p0))[~in_band]
    assert resid.max() < 2e-5, resid.max()
    assert np.any(nbv[~in_band] == p0[~in_band])


def test_sharded_narrowband_k2(eight_devices):
    """Banding also composes with halo-deep pipelining (k=2)."""
    import numpy as np
    from levelsetfortran_tpu.parallel.mesh import make_mesh
    from levelsetfortran_tpu.parallel.sharded import ShardedLevelSet

    n = (96, 32, 16)
    xs = [np.linspace(-1, 1, k) for k in n]
    gx, gy, gz = np.meshgrid(*xs, indexing="ij")
    phi0 = jnp.asarray(
        (np.sqrt(gx**2 + (0.3 * gy)**2 + (0.3 * gz)**2) - 0.3).astype(
            np.float32))
    dx = 2.0 / (n[0] - 1)
    h = 0.1 * dx
    mesh = make_mesh((2, 1, 1), eight_devices[:2])
    dense_s = ShardedLevelSet(mesh, n, dx, use_pallas=True,
                              steps_per_exchange=2)
    nb_s = ShardedLevelSet(mesh, n, dx, use_pallas=True, narrow_band=True,
                           band_radius=8.1, steps_per_exchange=2)
    assert dense_s.use_pallas and nb_s.use_pallas
    dense, _, _ = dense_s.reinit(dense_s.device_put(phi0), h, 4, 0.0)
    nb, _, _ = nb_s.reinit(nb_s.device_put(phi0), h, 4, 0.0)
    d = np.asarray(jax.device_get(dense))
    nbv = np.asarray(jax.device_get(nb))
    p0 = np.asarray(phi0)
    in_band = np.abs(p0) < 8.1 * dx
    np.testing.assert_allclose(nbv[in_band], d[in_band], atol=5e-6)
    assert np.any(nbv[~in_band] == p0[~in_band])


def test_sharded_advection_matches_single_device(eight_devices):
    """advect_nodes_sharded == advect_nodes: phi stays sharded, nodes are
    replicated and psum-merged (VERDICT r2 #10)."""
    import numpy as np
    from levelsetfortran_tpu.grid.grid import Grid3D
    from levelsetfortran_tpu.parallel.mesh import make_mesh
    from levelsetfortran_tpu.parallel.sharded import advect_nodes_sharded
    from levelsetfortran_tpu.solvers.advect import advect_nodes

    n = (32, 32, 16)
    dx = 0.1
    grid = Grid3D(shape=n, origin=(-1.55, -1.55, -0.75), dx=dx)
    pts = grid.coords(jnp.float32)
    phi = jnp.asarray(
        np.linalg.norm(np.asarray(pts), axis=-1).reshape(n) - 0.6,
        jnp.float32)
    rng = np.random.default_rng(0)
    # nodes slightly off the sphere, inside the grid's safe interior
    d = rng.normal(size=(40, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d[:, 2] *= 0.4
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nodes = jnp.asarray((0.66 * d).astype(np.float32))

    ref = advect_nodes(phi, grid, nodes, dx, iters=30)
    for mesh_shape in [(4, 2, 1), (2, 2, 2)]:
        mesh = make_mesh(mesh_shape, eight_devices)
        phi_s = jax.device_put(
            phi, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("x", "y", "z")))
        out = advect_nodes_sharded(mesh, phi_s, grid, nodes, dx, iters=30)
        np.testing.assert_allclose(np.asarray(jax.device_get(out.positions)),
                                   np.asarray(ref.positions), atol=2e-6)
        np.testing.assert_allclose(np.asarray(jax.device_get(out.phi_surf)),
                                   np.asarray(ref.phi_surf), atol=2e-6)


def test_sharded_pipeline_no_full_gather(eight_devices, tmp_path):
    """End-to-end sharded pipeline with gather_results=False: fields stay
    device arrays, outputs still written (streamed), advected nodes land
    on the surface."""
    import numpy as np
    from levelsetfortran_tpu.config import LevelSetConfig
    from levelsetfortran_tpu.models.analytic import icosphere_mesh
    from levelsetfortran_tpu.pipeline.run import run_mesh

    mesh = icosphere_mesh(radius=0.5, subdiv=1)
    cfg = LevelSetConfig(dx=0.1, pad_cells=4, reinit_iters=20,
                         minmax_iters=5, advect_iters=50,
                         final_reinit_iters=5, mesh_shape=(2, 2, 2),
                         gather_results=False)
    res = run_mesh(mesh, cfg, out_dir=str(tmp_path), write_outputs=True)
    assert isinstance(res.phi_init, jax.Array)
    assert isinstance(res.phi_final, jax.Array)
    assert (tmp_path / "signedDistanceFunction.vti").exists()
    assert (tmp_path / "surface.s3d").exists()
    # advected nodes sit near the (smoothed) zero level set
    assert np.abs(res.advected).std() > 0
    assert res.asymptotic_error < 0.5


@pytest.mark.slow
def test_reinit_fixed_sharded_pallas_grad_matches_single(eight_devices):
    """Sharded reverse mode ON THE FUSED KERNELS (VERDICT r3 missing #1):
    forward and gradient of the fixed-step sharded solve (per-shard Pallas
    forward + Pallas adjoint kernels with adjoint halo exchange) match the
    single-device fused scan."""
    import numpy as np
    from levelsetfortran_tpu.ops.weno_pallas import reinit_scan_pallas
    from levelsetfortran_tpu.parallel.mesh import make_mesh
    from levelsetfortran_tpu.parallel.sharded import reinit_fixed_sharded

    n = (32, 32, 16)
    xs = [np.linspace(-1.2, 1.2, k) for k in n]
    gx, gy, gz = np.meshgrid(*xs, indexing="ij")
    phi0 = jnp.asarray(
        (2.0 * (np.sqrt(gx**2 + gy**2 + gz**2) - 0.6)).astype(np.float32))
    dx = 2.4 / 31
    h = 0.1 * dx
    mesh = make_mesh((4, 2, 1), eight_devices)

    out_sh = reinit_fixed_sharded(mesh, phi0, dx, h, 4, use_pallas=True)
    ref = reinit_scan_pallas(phi0, dx, h, 4)
    np.testing.assert_allclose(np.asarray(jax.device_get(out_sh)),
                               np.asarray(ref), atol=2e-6)

    w = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                    jnp.float32)

    def loss_sh(p):
        return jnp.sum(w * reinit_fixed_sharded(mesh, p, dx, h, 4,
                                                use_pallas=True))

    def loss_ref(p):
        return jnp.sum(w * reinit_scan_pallas(p, dx, h, 4))

    g_sh = np.asarray(jax.device_get(jax.grad(loss_sh)(phi0)))
    g_ref = np.asarray(jax.grad(loss_ref)(phi0))
    assert np.abs(g_ref).max() > 0
    np.testing.assert_allclose(g_sh, g_ref, atol=2e-4, rtol=1e-3)


def test_minmax_fixed_sharded_pallas_grad_matches_single(eight_devices):
    """Fused sharded min/max reverse mode (gather-form cotangent
    exchange) matches the single-device fused scan."""
    import numpy as np
    from levelsetfortran_tpu.ops.minmax_pallas import minmax_scan_pallas
    from levelsetfortran_tpu.parallel.mesh import make_mesh
    from levelsetfortran_tpu.parallel.sharded import minmax_fixed_sharded

    n = (32, 32, 16)
    xs = [np.linspace(-1.2, 1.2, k) for k in n]
    gx, gy, gz = np.meshgrid(*xs, indexing="ij")
    phi0 = jnp.asarray(
        (np.sqrt(gx**2 + gy**2 + gz**2) - 0.6).astype(np.float32))
    dx = 2.4 / 31
    h1 = 0.05 * dx * dx
    mesh = make_mesh((4, 2, 1), eight_devices)

    out_sh = minmax_fixed_sharded(mesh, phi0, dx, h1, 5, use_pallas=True)
    ref = minmax_scan_pallas(phi0, dx, h1, 5)
    np.testing.assert_allclose(np.asarray(jax.device_get(out_sh)),
                               np.asarray(ref), atol=2e-6)

    w = jnp.asarray(np.random.default_rng(1).standard_normal(n),
                    jnp.float32)

    def loss_sh(p):
        return jnp.sum(w * minmax_fixed_sharded(mesh, p, dx, h1, 5,
                                                use_pallas=True))

    def loss_ref(p):
        return jnp.sum(w * minmax_scan_pallas(p, dx, h1, 5))

    g_sh = np.asarray(jax.device_get(jax.grad(loss_sh)(phi0)))
    g_ref = np.asarray(jax.grad(loss_ref)(phi0))
    assert np.abs(g_ref).max() > 0
    np.testing.assert_allclose(g_sh, g_ref, atol=2e-4, rtol=1e-3)


def test_sharded_k2_fused_rms_matches_single_device(eight_devices):
    """k=2 halo-deep pipelining now fuses the convergence reduction
    in-kernel with owned-range bounds (VERDICT r3 weak #6): the reported
    RMS equals the single-device solver's RMS at the same iterate."""
    import numpy as np
    from levelsetfortran_tpu.parallel.mesh import make_mesh
    from levelsetfortran_tpu.parallel.sharded import ShardedLevelSet
    from levelsetfortran_tpu.solvers.reinit import reinit

    n = (64, 64, 16)
    xs = [np.linspace(-1.2, 1.2, k) for k in n]
    gx, gy, gz = np.meshgrid(*xs, indexing="ij")
    phi0 = jnp.asarray(
        (2.0 * (np.sqrt(gx**2 + gy**2 + gz**2) - 0.6)).astype(np.float32))
    dx = 2.4 / 63
    h = 0.1 * dx
    ref = reinit(phi0, dx, h, 4, 0.0, use_pallas=False)
    mesh = make_mesh((2, 2, 1), eight_devices[:4])
    s = ShardedLevelSet(mesh, n, dx, use_pallas=True,
                        steps_per_exchange=2)
    assert s.use_pallas
    out, it, rms = s.reinit(s.device_put(phi0), h, iters=4, tol=0.0)
    assert int(it) == 4
    np.testing.assert_allclose(np.asarray(jax.device_get(out)),
                               np.asarray(ref.phi), atol=2e-6)
    # RMS definition matches the dense solver's last-step delta
    np.testing.assert_allclose(float(rms), float(ref.final_rms),
                               rtol=1e-4, atol=1e-8)


def test_pallas_overlap_step_matches_plain(eight_devices):
    """Exchange/compute overlap on the PALLAS route (VERDICT r3 missing
    #3): interior-rectangle + shell-strip kernel calls produce bitwise
    the same iterates as the plain persistent step."""
    import numpy as np
    from levelsetfortran_tpu.ops import weno_pallas as wp
    from levelsetfortran_tpu.parallel.halo import halo_exchange
    from levelsetfortran_tpu.parallel.mesh import AXIS_NAMES, make_mesh
    from levelsetfortran_tpu.parallel.sharded import (
        reinit_k_steps_persistent, reinit_step_overlap_persistent,
        shard_map)
    from jax.sharding import PartitionSpec as P

    n = (64, 96, 16)     # blocks (32, 48), tile (8, 16) -> 4x3 tiles
    xs = [np.linspace(-1.2, 1.2, k) for k in n]
    gx, gy, gz = np.meshgrid(*xs, indexing="ij")
    phi0 = jnp.asarray(
        (2.0 * (np.sqrt(gx**2 + gy**2 + gz**2) - 0.6)).astype(np.float32))
    dx = 2.4 / 63
    h = 0.1 * dx
    mesh_shape = (2, 2, 1)
    mesh = make_mesh(mesh_shape, eight_devices[:4])
    tile = (8, 16)
    bx, by = 32, 48
    nzp = 128
    widths = (wp.XA, wp.YA, 0)
    spec = P(*AXIS_NAMES)
    kw = dict(gshape=n, mesh_shape=mesh_shape, tile=tile, bx=bx, by=by,
              interpret=True)

    def make(overlap):
        def local(p0):
            pz = jnp.pad(p0, ((0, 0), (0, 0), (0, nzp - n[2])),
                         mode="edge")
            sign_pad = halo_exchange(pz, widths, mesh_shape)
            pad = jnp.pad(pz, ((widths[0],) * 2, (widths[1],) * 2,
                               (0, 0)))
            dsq = None
            for _ in range(3):
                if overlap:
                    pad, dsq = reinit_step_overlap_persistent(
                        pad, sign_pad, dx, h, with_rms=True, **kw)
                else:
                    pad, dsq = reinit_k_steps_persistent(
                        pad, sign_pad, dx, h, 1, ext=(0, 0),
                        with_rms=True, **kw)
            out = pad[widths[0]:widths[0] + bx,
                      widths[1]:widths[1] + by, :n[2]]
            return out, jax.lax.psum(dsq, AXIS_NAMES)
        return jax.jit(shard_map(local, mesh=mesh, in_specs=(spec,),
                                 out_specs=(spec, P()), check_vma=False))

    p1, d1 = make(False)(phi0)
    p2, d2 = make(True)(phi0)
    np.testing.assert_array_equal(np.asarray(jax.device_get(p1)),
                                  np.asarray(jax.device_get(p2)))
    np.testing.assert_allclose(float(d1), float(d2), rtol=1e-6)


@pytest.mark.slow
def test_reinit_banded_sharded_grad_matches_single(eight_devices):
    """Narrow-band x sharded x differentiable composition (VERDICT r4
    next #4): with a matching tile, the banded sharded fixed-step solve
    and its gradient match the single-device banded scan — per-shard
    masks from the exchanged pads reproduce the global mask on the
    aligned tile grid."""
    import numpy as np
    from levelsetfortran_tpu.ops.weno_pallas import (
        reinit_scan_pallas_banded)
    from levelsetfortran_tpu.parallel.mesh import make_mesh
    from levelsetfortran_tpu.parallel.sharded import reinit_fixed_sharded

    n = (64, 32, 16)
    xs = [np.linspace(-3.0, 3.0, n[0]), np.linspace(-1.2, 1.2, n[1]),
          np.linspace(-0.6, 0.6, n[2])]
    gx, gy, gz = np.meshgrid(*xs, indexing="ij")
    s1 = np.sqrt((gx + 2.2) ** 2 + gy ** 2 + gz ** 2) - 0.3
    s2 = np.sqrt((gx - 2.2) ** 2 + gy ** 2 + gz ** 2) - 0.3
    phi0 = jnp.asarray((1.5 * np.minimum(s1, s2)).astype(np.float32))
    dx = 2.4 / 31
    h = 0.1 * dx
    mesh = make_mesh((4, 2, 1), eight_devices)
    tile = (8, 8)
    band = 4.1

    out_sh = reinit_fixed_sharded(mesh, phi0, dx, h, 5, use_pallas=True,
                                  band_radius=band, refresh_every=3,
                                  tile=tile)
    ref = reinit_scan_pallas_banded(phi0, dx, h, 5, band_radius=band,
                                    refresh_every=3, tile=tile,
                                    axis_order=(0, 1, 2))
    np.testing.assert_allclose(np.asarray(jax.device_get(out_sh)),
                               np.asarray(ref), atol=2e-6)
    # freezing must actually occur somewhere or the test is vacuous
    assert np.any(np.asarray(jax.device_get(out_sh)) == np.asarray(phi0))

    w = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                    jnp.float32)

    def loss_sh(p):
        return jnp.sum(w * reinit_fixed_sharded(
            mesh, p, dx, h, 5, use_pallas=True, band_radius=band,
            refresh_every=3, tile=tile))

    def loss_ref(p):
        return jnp.sum(w * reinit_scan_pallas_banded(
            p, dx, h, 5, band_radius=band, refresh_every=3, tile=tile,
            axis_order=(0, 1, 2)))

    g_sh = np.asarray(jax.device_get(jax.grad(loss_sh)(phi0)))
    g_ref = np.asarray(jax.grad(loss_ref)(phi0))
    assert np.abs(g_ref).max() > 0
    np.testing.assert_allclose(g_sh, g_ref, atol=2e-4, rtol=1e-3)
