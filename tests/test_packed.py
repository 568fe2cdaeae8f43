"""Packed serving: B geometries concatenated along x run as ONE fused
kernel launch per step (weno_pallas/minmax_pallas ``pack``), with
solo-exact per-geometry BC masks, per-geometry h and per-geometry fused
RMS.  Trajectories must equal the solo fused solvers' — including
per-element iteration counts and freeze-on-convergence semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from levelsetfortran_tpu.config import LevelSetConfig
from levelsetfortran_tpu.grid.grid import Grid3D
from levelsetfortran_tpu.models.analytic import (box_mesh, icosphere_mesh,
                                                 sdf_sphere)
from levelsetfortran_tpu.ops import weno_pallas as wp
from levelsetfortran_tpu.pipeline.batch import (minmax_batched_packed,
                                                packed_applicable,
                                                reinit_batched_packed,
                                                run_batch)
from levelsetfortran_tpu.solvers.minmax_flow import minmax_flow
from levelsetfortran_tpu.solvers.reinit import reinit

pytestmark = pytest.mark.kernel


def _grid(n=16, dx=0.1):
    origin = (-(n - 1) * dx / 2,) * 3
    return Grid3D(shape=(n, n, n), origin=origin, dx=dx)


def _phis(grid, radii=(0.45, 0.6, 0.7), scale=2.0):
    pts = grid.coords(jnp.float32)
    return jnp.stack([
        scale * sdf_sphere(pts, (0.0, 0.0, 0.0), r).astype(jnp.float32)
        for r in radii])


def test_pack_unpack_roundtrip():
    grid = _grid()
    phis = _phis(grid)
    tile = wp._pick_tile(grid.shape)
    packed = wp.pack_for_pallas(phis, tile)
    assert packed.shape[0] % phis.shape[0] == 0
    out = wp.unpack_from_pallas(packed, phis.shape[0], grid.shape)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(phis))


def test_packed_scan_matches_solo_fused():
    """Fixed-step packed scan == per-geometry solo fused scans (the
    per-tile computation is identical: same windows, same local
    coordinates — bitwise in interpret mode, where precise is forced)."""
    grid = _grid()
    phis = _phis(grid)
    h = 0.1 * grid.dx
    packed = wp.reinit_scan_pallas_packed(phis, grid.dx, h, 4)
    for i in range(phis.shape[0]):
        solo = wp.reinit_scan_pallas(phis[i], grid.dx, h, 4)
        np.testing.assert_allclose(np.asarray(packed[i]),
                                   np.asarray(solo), atol=1e-7)


def test_packed_step_per_geometry_h_rms_and_freeze():
    """One packed step with per-geometry h, a frozen middle geometry
    (banded passthrough) and the per-geometry fused RMS vector."""
    grid = _grid()
    n = grid.shape[0]
    phis = _phis(grid)
    b = phis.shape[0]
    hv = jnp.asarray([0.08, 0.1, 0.12], jnp.float32) * grid.dx
    tile = wp._pick_tile(grid.shape)
    tpg = wp._ceil_to(n, tile[0]) // tile[0]
    nby = wp._ceil_to(n, tile[1]) // tile[1]
    act = np.ones((b * tpg, nby), np.int32)
    act[tpg:2 * tpg] = 0                      # freeze geometry 1
    pk = wp.pack_for_pallas(phis, tile)
    out, dsq = wp._pallas_step_padded(
        pk, pk, jnp.float32(grid.dx), hv, gshape=grid.shape,
        eps_scale=1e-6, eps_floor=1e-10, quirk_y_p5_zero=False, tile=tile,
        interpret=True, with_rms=True, active=jnp.asarray(act), pack=b)
    up = wp.unpack_from_pallas(out, b, grid.shape)

    assert bool(jnp.all(up[1] == phis[1]))        # frozen: passthrough
    assert float(dsq[1]) == 0.0
    for i in (0, 2):                              # live: solo-exact + RMS
        solo = wp.reinit_step_pallas(phis[i], phis[i], grid.dx,
                                     float(hv[i]), interpret=True)
        np.testing.assert_array_equal(np.asarray(up[i]), np.asarray(solo))
        np.testing.assert_allclose(
            float(dsq[i]), float(jnp.sum((solo - phis[i]) ** 2)),
            rtol=1e-5)


def test_reinit_batched_packed_matches_solo():
    """Tolerance path: per-element iteration counts and fields equal solo
    fused ``reinit`` runs; early-converged elements freeze."""
    grid = _grid(n=20)
    phis = _phis(grid)
    # an exact SDF (|grad| = 1) converges almost immediately; the scaled
    # ones keep integrating — exercises per-element freezing
    pts = grid.coords(jnp.float32)
    exact = sdf_sphere(pts, (0.0, 0.0, 0.0), 0.6).astype(jnp.float32)
    phis = jnp.concatenate([phis, exact[None]])
    assert packed_applicable(grid.shape, jnp.float32)
    hv = jnp.asarray([0.08, 0.1, 0.12, 0.1], jnp.float32) * grid.dx

    out, counts, rms, div = reinit_batched_packed(
        phis, grid.dx, hv, 25, 5e-4)
    iters = [int(c) for c in counts]
    assert iters[3] < iters[0]      # exact SDF froze early
    for i in range(phis.shape[0]):
        solo = reinit(phis[i], grid.dx, float(hv[i]), 25, 5e-4,
                      use_pallas=True)
        np.testing.assert_allclose(np.asarray(out[i]),
                                   np.asarray(solo.phi), atol=1e-7)
        assert iters[i] == int(solo.iterations)
        np.testing.assert_allclose(float(rms[i]), float(solo.final_rms),
                                   rtol=1e-5)
        assert not bool(div[i])


def test_minmax_batched_packed_matches_solo():
    grid = _grid(n=20)
    phi = np.array(_phis(grid, radii=(0.6,))[0])
    phi[8:12, 8:12, 8:12] += 0.5 * grid.dx       # dent: work to do
    phis = jnp.stack([jnp.asarray(phi), 1.3 * jnp.asarray(phi)])
    hv = jnp.asarray([0.01, 0.02], jnp.float32) * grid.dx

    out, counts, rms, _ = minmax_batched_packed(
        phis, grid.dx, hv, 15, 1e-9)
    for i in range(2):
        solo = minmax_flow(phis[i], grid.dx, float(hv[i]), 15, 1e-9,
                           use_pallas=True)
        np.testing.assert_allclose(np.asarray(out[i]),
                                   np.asarray(solo.phi), atol=1e-7)
        assert int(counts[i]) == int(solo.iterations)


def test_run_batch_packed_strategy_matches_sequential():
    # pad_cells=10 (the reference default, set3d.f90:148): the fused
    # kernel's edge-clamped faces and the jnp path's circular rolls only
    # agree when the narrow band never reaches the faces
    cfg = LevelSetConfig(dx=0.12, pad_cells=10, reinit_iters=15,
                         minmax_iters=5, advect_iters=3,
                         dtype=jnp.float32)
    meshes = [box_mesh(half_extent=(0.5, 0.5, 0.5)),
              icosphere_mesh(radius=0.5, subdivisions=1)]
    p = run_batch(meshes, cfg, strategy="packed")
    s = run_batch(meshes, cfg, strategy="sequential")
    for a, b in zip(p, s):
        np.testing.assert_allclose(a.phi_init, b.phi_init, atol=5e-6)
        np.testing.assert_allclose(a.phi_smoothed, b.phi_smoothed,
                                   atol=5e-6)
        assert a.reinit_iters == b.reinit_iters
        assert a.minmax_iters == b.minmax_iters


def test_init_scan_matmul_precision_pinned():
    """The quad-form init scans MUST pin MXU precision: the TPU default
    (bf16 passes) corrupts the Ericson region classification — measured
    on twoCube10 as far-field phi spikes to 2e4 and a reinit that runs to
    the 10k-iteration cap instead of 16 steps.  CPU tests compute f32
    regardless, so this gate inspects the jaxpr instead of the values."""
    from levelsetfortran_tpu.ops.init_sign import (nearest_centroid,
                                                   nearest_sign_scan)

    def dot_precisions(fn, *args):
        jaxpr = jax.make_jaxpr(fn)(*args)
        found = []

        def walk(j):
            for eq in j.eqns:
                if eq.primitive.name == "dot_general":
                    found.append(eq.params.get("precision"))
                for v in eq.params.values():
                    for x in (v if isinstance(v, (list, tuple)) else (v,)):
                        if hasattr(x, "jaxpr"):
                            walk(x.jaxpr)

        walk(jaxpr.jaxpr)
        return found

    pts = jnp.zeros((32, 3), jnp.float32)
    tri = jnp.zeros((16, 3, 3), jnp.float32)
    cen = jnp.zeros((16, 3), jnp.float32)
    for fn, args in ((lambda p, t: nearest_sign_scan(p, t), (pts, tri)),
                     (nearest_centroid, (pts, cen))):
        precs = dot_precisions(fn, *args)
        assert precs, "expected an MXU dot in the scan"
        for p in precs:
            assert p == (jax.lax.Precision.HIGHEST,) * 2, p
