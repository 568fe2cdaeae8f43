"""Narrow-band reinit (BASELINE config 3): tile-granular activity masking.

The TPU analogue of the reference's narrow-band masks (subs.f90:178-207,
applied in set3d.f90:402,420): whole kernel tiles are skipped when no cell
in their stencil window lies within band_radius*dx of the interface.
Runs in Pallas interpret mode on CPU (conftest forces the cpu backend).
"""

import jax.numpy as jnp
import numpy as np

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
