"""Narrow-band reinit (BASELINE config 3): tile-granular activity masking.

The TPU analogue of the reference's narrow-band masks (subs.f90:178-207,
applied in set3d.f90:402,420): whole kernel tiles are skipped when no cell
in their stencil window lies within band_radius*dx of the interface.
Runs in Pallas interpret mode on CPU (conftest forces the cpu backend).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from levelsetfortran_tpu.ops.weno_pallas import (
    XA, pad_for_pallas, tile_activity)
from levelsetfortran_tpu.solvers.reinit import reinit, reinit_narrowband


def _sphere(shape, r=0.5):
    xs = [np.linspace(-1, 1, k) for k in shape]
    gx, gy, gz = np.meshgrid(*xs, indexing="ij")
    return jnp.asarray(
        (np.sqrt(gx ** 2 + gy ** 2 + gz ** 2) - r).astype(np.float32))


def test_tile_activity_marks_band_and_dilates():
    shape = (32, 32, 16)
    phi = _sphere(shape, r=0.5)
    tile = (8, 8)
    pad = pad_for_pallas(phi, tile)
    act = np.asarray(tile_activity(pad, shape, tile, 2.0 / 31, 4.1))
    assert act.shape == (4, 4)
    # corner tiles are > 4.1*dx+dilation from the r=0.5 sphere on this
    # domain only if far enough; center tiles straddle the interface
    assert act.sum() > 0
    # every tile whose own |phi| min is inside the band must be active
    owned = np.abs(np.asarray(phi))
    m = owned.reshape(4, 8, 4, 8, 16).min(axis=(1, 3, 4))
    assert np.all(act[m < 4.1 * (2.0 / 31)] == 1)


def test_narrowband_matches_dense_in_band():
    """On a near-converged SDF the narrow-band solver's field equals the
    dense solver's within the band; frozen far-field tiles keep their
    (already sub-tolerance) values."""
    shape = (96, 96, 16)          # big enough that some tiles freeze
    phi0 = _sphere(shape, r=0.3)
    dx = 2.0 / (shape[0] - 1)
    h = 0.1 * dx
    band = 8.1

    dense = reinit(phi0, dx, h, 6, 0.0, use_pallas=True)
    nb = reinit_narrowband(phi0, dx, h, 6, 0.0, band_radius=band,
                           refresh_every=3, use_pallas=True)
    assert int(nb.iterations) == 6
    assert not bool(nb.diverged)

    in_band = np.abs(np.asarray(phi0)) < band * dx
    d = np.asarray(dense.phi)
    n = np.asarray(nb.phi)
    # in the band: the update is the same kernel -> near bit-equal
    np.testing.assert_allclose(n[in_band], d[in_band], atol=5e-6)
    # outside: every cell is either in a frozen tile (holds phi0 exactly)
    # or in an active tile (gets the dense update, incl. ghost BCs)
    out_band = ~in_band
    p0 = np.asarray(phi0)
    resid = np.minimum(np.abs(n - d), np.abs(n - p0))[out_band]
    # active cells whose stencil reads frozen neighbors see the neighbors'
    # (tiny, sub-tolerance) far-field drift withheld -> small third state
    assert np.max(resid) < 2e-5, np.max(resid)
    # and freezing actually happened somewhere (otherwise the test is vacuous)
    assert np.any(n[out_band] == p0[out_band])


def test_narrowband_falls_back_when_unsupported():
    """f64 grids route to the dense jnp solver (no fused kernel)."""
    shape = (12, 12, 12)
    phi0 = _sphere(shape).astype(jnp.float64)
    dx = 2.0 / 11
    r = reinit_narrowband(phi0, dx, 0.1 * dx, 3, 0.0)
    ref = reinit(phi0, dx, 0.1 * dx, 3, 0.0, use_pallas=False)
    np.testing.assert_allclose(np.asarray(r.phi), np.asarray(ref.phi),
                               atol=1e-12)


def test_minmax_narrowband_bitwise_equals_dense():
    """Banded min/max is EXACT (not banded-approximate like reinit): the
    update gate is the cell's own frozen value, so frozen tiles can never
    enter the band — every iterate matches the dense solve bitwise."""
    from levelsetfortran_tpu.solvers.minmax_flow import (
        minmax_flow, minmax_flow_narrowband)
    shape = (32, 32, 32)
    phi0 = _sphere(shape, r=0.45)
    dx = 2.0 / 31
    h1 = 0.01 * dx * dx
    dense = minmax_flow(phi0, dx, h1, 12, 0.0, use_pallas=True)
    banded = minmax_flow_narrowband(phi0, dx, h1, 12, 0.0,
                                    refresh_every=4, use_pallas=True,
                                    axis_order=(0, 1, 2))
    assert int(banded.iterations) == 12
    np.testing.assert_array_equal(np.asarray(banded.phi),
                                  np.asarray(dense.phi))


def test_minmax_banded_kernel_matches_dense_step():
    """One banded kernel step with a genuinely skipping mask equals the
    dense kernel step (inactive tiles are provably out-of-band)."""
    from levelsetfortran_tpu.ops import minmax_pallas as mp
    from levelsetfortran_tpu.ops.weno_pallas import tile_activity
    shape = (32, 32, 32)
    # off-center small sphere: tile skipping is (tx, ty)-column granular
    # (whole z in lanes), so the body must be far from some x/y columns
    xs = np.linspace(-1, 1, 32)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    phi0 = jnp.asarray((np.sqrt((gx + 0.6) ** 2 + (gy + 0.6) ** 2
                                + gz ** 2) - 0.2).astype(np.float32))
    dx = 2.0 / 31
    h1 = 0.01 * dx * dx
    tile = (8, 16)
    pad = mp.pad_for_pallas(phi0, tile)
    args = (jnp.float32(dx), jnp.float32(h1), jnp.float32(4.1),
            jnp.float32(0.0))
    active = tile_activity(pad, shape, tile, dx, 4.1)
    assert 0 < int(jnp.sum(active)) < active.size   # mask actually skips
    dense = mp.minmax_step_padded(pad, *args, gshape=shape, tile=tile,
                                  interpret=True)
    banded, dsq = mp.minmax_step_padded(pad, *args, gshape=shape,
                                        tile=tile, interpret=True,
                                        active=active, with_rms=True)
    own = np.s_[4:4 + 32, 8:8 + 32, :32]   # XA=4, YA=8 owned crop
    np.testing.assert_array_equal(np.asarray(banded[own]),
                                  np.asarray(dense[own]))
    # fused RMS consistent with the actual change
    d = np.asarray(banded[own]) - np.asarray(phi0)
    np.testing.assert_allclose(float(dsq), float((d * d).sum()),
                               rtol=1e-5)


def test_minmax_sharded_banded_matches_dense(eight_devices):
    """Sharded banded min/max (solve-long mask) == sharded dense min/max
    == single-device dense."""
    from levelsetfortran_tpu.parallel.mesh import make_mesh
    from levelsetfortran_tpu.parallel.sharded import ShardedLevelSet
    from levelsetfortran_tpu.solvers.minmax_flow import minmax_flow
    shape = (32, 32, 32)
    phi0 = _sphere(shape, r=0.45)
    dx = 2.0 / 31
    h1 = 0.01 * dx * dx
    mesh = make_mesh((2, 2, 1), eight_devices[:4])
    s_nb = ShardedLevelSet(mesh, shape, dx, use_pallas=True,
                           narrow_band=True)
    p_nb, n_nb, _ = s_nb.minmax_flow(s_nb.device_put(phi0), h1, 8, 0.0)
    ref = minmax_flow(phi0, dx, h1, 8, 0.0, use_pallas=True)
    np.testing.assert_allclose(np.asarray(p_nb), np.asarray(ref.phi),
                               atol=2e-7, rtol=1e-6)


@pytest.mark.slow
def test_banded_scan_all_active_grad_equals_dense():
    """With every tile active, the banded differentiable scan must equal
    the dense fused scan — forward AND gradient (validates the banded
    adjoint kernel wiring on the all-active path)."""
    import jax
    from levelsetfortran_tpu.ops.weno_pallas import (
        reinit_scan_pallas, reinit_scan_pallas_banded)
    shape = (16, 32, 16)
    phi = _sphere(shape, r=0.5) * 2.0
    dx = 2.0 / 31
    h = 0.1 * dx
    # huge band radius: every tile active
    out_b = reinit_scan_pallas_banded(phi, dx, h, 4, band_radius=1e3,
                                      refresh_every=2,
                                      axis_order=(0, 1, 2))
    out_d = reinit_scan_pallas(phi, dx, h, 4, precise=False,
                               tile=(8, 16))
    # the cond-wrapped compute may fuse differently: ~1 ulp
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_d),
                               atol=1e-6, rtol=1e-6)

    w = jnp.asarray(np.random.default_rng(0).standard_normal(shape),
                    jnp.float32)

    def loss_b(p):
        return jnp.sum(w * reinit_scan_pallas_banded(
            p, dx, h, 4, band_radius=1e3, refresh_every=2,
            axis_order=(0, 1, 2)))

    def loss_d(p):
        return jnp.sum(w * reinit_scan_pallas(p, dx, h, 4, precise=False,
                                              tile=(8, 16)))

    g_b = jax.grad(loss_b)(phi)
    g_d = jax.grad(loss_d)(phi)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_d),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_banded_scan_grad_far_field_identity_and_near_dense():
    """With genuinely frozen tiles: (a) cotangents at deep-frozen cells
    are EXACTLY the upstream cotangent (identity passthrough adjoint);
    (b) in-band gradients match the dense scan's within the established
    gate on a converged-ish SDF."""
    import jax
    from levelsetfortran_tpu.ops.weno_pallas import (
        reinit_scan_pallas, reinit_scan_pallas_banded)
    # off-center small sphere on a wider domain -> far x/y columns freeze
    n = 48
    xs = np.linspace(-1.5, 1.5, n, dtype=np.float32)
    gx, gy, gz = np.meshgrid(xs, xs, xs[:16], indexing="ij")
    phi = jnp.asarray(np.sqrt((gx + 0.9) ** 2 + (gy + 0.9) ** 2 + gz ** 2)
                      - 0.25)
    dx = float(xs[1] - xs[0])
    h = 0.1 * dx
    w = jnp.asarray(np.random.default_rng(1).standard_normal(phi.shape),
                    jnp.float32)
    kw = dict(band_radius=8.1, refresh_every=4, axis_order=(0, 1, 2))

    def loss_b(p):
        return jnp.sum(w * reinit_scan_pallas_banded(p, dx, h, 8, **kw))

    g_b = np.asarray(jax.grad(loss_b)(phi))
    # (a) identity adjoint at deep-frozen cells (far corner, > window
    # distance from any active tile)
    np.testing.assert_array_equal(g_b[-8:, -8:, :], np.asarray(w)[-8:, -8:, :])

    # (b) near-band agreement with the dense gradient
    def loss_d(p):
        return jnp.sum(w * reinit_scan_pallas(p, dx, h, 8, precise=False,
                                              tile=(8, 16)))

    g_d = np.asarray(jax.grad(loss_d)(phi))
    band = np.abs(np.asarray(phi)) < 4.1 * dx
    np.testing.assert_allclose(g_b[band], g_d[band], atol=2e-4, rtol=1e-3)


def test_minmax_skip_kernel_carry_alias_step():
    """Zero-copy skip mode: a step with a donated carry buffer equals the
    dense step, given a carry that holds every frozen tile's values (the
    ping-pong invariant minmax_flow_narrowband maintains).  Inactive
    tiles' owned cells must come from the CARRY (they start no DMA at
    all), active tiles from the stencil update."""
    from levelsetfortran_tpu.ops import minmax_pallas as mp
    from levelsetfortran_tpu.ops.weno_pallas import tile_activity
    shape = (32, 32, 32)
    xs = np.linspace(-1, 1, 32)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    phi0 = jnp.asarray((np.sqrt((gx + 0.6) ** 2 + (gy + 0.6) ** 2
                                + gz ** 2) - 0.2).astype(np.float32))
    dx = 2.0 / 31
    h1 = 0.01 * dx * dx
    tile = (8, 16)
    pad = mp.pad_for_pallas(phi0, tile)
    args = (jnp.float32(dx), jnp.float32(h1), jnp.float32(4.1),
            jnp.float32(0.0))
    kw = dict(gshape=shape, tile=tile, interpret=True)
    active = tile_activity(pad, shape, tile, dx, 4.1, margin_cells=1.0)
    assert 0 < int(jnp.sum(active)) < active.size   # mask actually skips
    dense = mp.minmax_step_padded(pad, *args, **kw)
    # a valid carry: frozen-tile owned cells equal pad's (out-of-band
    # cells never change, so any prior iterate qualifies); poison the
    # ACTIVE tiles' owned cells to prove they are fully rewritten
    tx, ty = tile
    poison = np.asarray(pad).copy()
    act_np = np.asarray(active)
    for bi in range(act_np.shape[0]):
        for bj in range(act_np.shape[1]):
            if act_np[bi, bj]:
                poison[4 + bi * tx:4 + (bi + 1) * tx,
                       8 + bj * ty:8 + (bj + 1) * ty, :] = np.nan
    skip, dsq = mp.minmax_step_padded(pad, *args, active=active,
                                      carry=jnp.asarray(poison),
                                      with_rms=True, **kw)
    own = np.s_[4:4 + 32, 8:8 + 32, :32]
    np.testing.assert_array_equal(np.asarray(skip[own]),
                                  np.asarray(dense[own]))
    d = np.asarray(skip[own]) - np.asarray(phi0)
    np.testing.assert_allclose(float(dsq), float((d * d).sum()), rtol=1e-5)


def test_minmax_narrowband_odd_refresh_and_tail():
    """Odd refresh interval and a non-aligned iteration count exercise
    the even-chunk rounding and the odd-tail passthrough step; the
    banded solve must still match dense bitwise with exact iteration
    accounting."""
    from levelsetfortran_tpu.solvers.minmax_flow import (
        minmax_flow, minmax_flow_narrowband)
    shape = (32, 32, 32)
    phi0 = _sphere(shape, r=0.45)
    dx = 2.0 / 31
    h1 = 0.01 * dx * dx
    for iters in (1, 2, 7):
        dense = minmax_flow(phi0, dx, h1, iters, 0.0, use_pallas=True)
        banded = minmax_flow_narrowband(phi0, dx, h1, iters, 0.0,
                                        refresh_every=3, use_pallas=True,
                                        axis_order=(0, 1, 2))
        assert int(banded.iterations) == iters
        np.testing.assert_array_equal(np.asarray(banded.phi),
                                      np.asarray(dense.phi))


def test_zchunk_kernel_modes_match_dense():
    """The z-chunk bitmask kernel mode (reachable via the explicit ``szc``
    argument; auto-routing is off — see weno_pallas._pick_szc's measured
    rationale): all-active chunks are bitwise dense, frozen chunks pass
    through exactly, and the zero-copy carry mode matches passthrough."""
    from levelsetfortran_tpu.ops import weno_pallas as wp
    nx, ny, nz = 24, 24, 256
    rng = np.random.default_rng(3)
    xs = np.linspace(-1, 1, nx)
    zs = np.linspace(-1, 1, nz)
    gx, gy, gz = np.meshgrid(xs, xs, zs, indexing="ij")
    phi = jnp.asarray((np.sqrt(gx**2 + gy**2 + gz**2) - 0.55)
                      .astype(np.float32))
    dx = jnp.float32(2.0 / (nz - 1))
    h = jnp.float32(0.1 * 2.0 / (nz - 1))
    tile = (8, 8)
    pp = wp.pad_for_pallas(phi, tile)
    gshape = (nx, ny, nz)
    kw = dict(gshape=gshape, eps_scale=1e-6, eps_floor=1e-6,
              quirk_y_p5_zero=False, tile=tile, interpret=True,
              precise=True)
    dense = wp.crop_from_pallas(
        wp._pallas_step_padded(pp, pp, dx, h, **kw), gshape)
    szc = 128
    nzg = pp.shape[2] // szc
    nbx = (pp.shape[0] - 2 * wp.XA) // tile[0]
    nby = (pp.shape[1] - 2 * wp.YA) // tile[1]

    # all-active bitmask == dense bitwise
    allb = jnp.full((nbx, nby), (1 << nzg) - 1, jnp.int32)
    z_all = wp.crop_from_pallas(wp._pallas_step_padded(
        pp, pp, dx, h, active=allb, szc=szc, **kw), gshape)
    np.testing.assert_array_equal(np.asarray(z_all), np.asarray(dense))

    # random bitmask: frozen chunks untouched, active chunks dense
    bits = jnp.asarray(rng.integers(0, 2 ** nzg, (nbx, nby)), jnp.int32)
    z_m = np.asarray(wp.crop_from_pallas(wp._pallas_step_padded(
        pp, pp, dx, h, active=bits, szc=szc, **kw), gshape))
    b = np.asarray(bits)
    frozen = np.ones(gshape, bool)
    for bi in range(nbx):
        for bj in range(nby):
            for g in range(nzg):
                if (b[bi, bj] >> g) & 1:
                    frozen[bi * 8:(bi + 1) * 8, bj * 8:(bj + 1) * 8,
                           g * szc:(g + 1) * szc] = False
    assert frozen.any() and (~frozen).any()
    np.testing.assert_array_equal(z_m[frozen], np.asarray(phi)[frozen])
    np.testing.assert_array_equal(z_m[~frozen], np.asarray(dense)[~frozen])

    # zero-copy carry (skip mode) composes with the bitmask
    sentinel = pp * 0 + 7.0
    z_c = np.asarray(wp.crop_from_pallas(wp._pallas_step_padded(
        pp, pp, dx, h, active=bits, szc=szc, carry=sentinel, **kw),
        gshape))
    col_frozen = (b == 0)
    for bi in range(nbx):
        for bj in range(nby):
            blk = z_c[bi * 8:(bi + 1) * 8, bj * 8:(bj + 1) * 8, :]
            if col_frozen[bi, bj]:
                assert np.all(blk == 7.0)      # untouched carry values
            else:
                np.testing.assert_array_equal(
                    blk, z_m[bi * 8:(bi + 1) * 8, bj * 8:(bj + 1) * 8, :])


def test_tile_activity_criteria_match_bruteforce():
    """The two-stage activity reductions (owned / band4 / stencil, column
    and z-chunk bitmask forms) match a brute-force evaluation of their
    documented window semantics on random data."""
    from levelsetfortran_tpu.ops import weno_pallas as wp
    rng = np.random.default_rng(0)
    nx, ny, nz = 40, 24, 256
    phi = jnp.asarray(rng.normal(2.0, 1.0, (nx, ny, nz)).astype(np.float32))
    dx = jnp.float32(0.01)
    tile = (8, 8)
    pp = wp.pad_for_pallas(phi, tile)
    thresh = (8.1 + 0.5) * 0.01
    a = np.abs(np.asarray(phi))
    nbx, nby = 5, 3

    def brute(szc, dil_x, dil_y, dil_z):
        nzg = 1 if szc is None else nz // szc
        ref = np.zeros((nbx, nby), np.int32)
        for bi in range(nbx):
            for bj in range(nby):
                bits = 0
                for g in range(nzg):
                    zc = nz if szc is None else szc
                    x0, x1 = max(0, bi * 8 - dil_x), min(nx, bi * 8 + 8
                                                         + dil_x)
                    y0, y1 = max(0, bj * 8 - dil_y), min(ny, bj * 8 + 8
                                                         + dil_y)
                    z0, z1 = max(0, g * zc - dil_z), min(nz, g * zc + zc
                                                         + dil_z)
                    if (a[x0:x1, y0:y1, z0:z1] < thresh).any():
                        bits |= 1 << g
                ref[bi, bj] = bits if szc else (1 if bits else 0)
        return ref

    for szc in (None, 128):
        for win, (dx_, dy_, dz_) in [("owned", (0, 0, 0)),
                                     ("band4", (4, 4, 4)),
                                     ("stencil", (4, 8, 8))]:
            got = np.asarray(wp.tile_activity(
                pp, (nx, ny, nz), tile, dx, 8.1, margin_cells=0.5,
                szc=szc, window=win))
            ref = brute(szc, dx_, dy_, dz_)
            if win == "stencil" and szc is not None:
                # szc-mode stencil z-window over-approximates ±4 to ±8
                # (one sub-block) — supersets are sound
                assert np.all(got & ref == ref), (win, szc)
            else:
                np.testing.assert_array_equal(got, ref, err_msg=f"{win}")
