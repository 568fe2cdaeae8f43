"""Fused Pallas min/max flow kernel vs the jnp path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from levelsetfortran_tpu.ops.minmax_pallas import minmax_scan_pallas
from levelsetfortran_tpu.solvers.minmax_flow import (minmax_flow,
                                                     minmax_flow_fixed)


def _sdf(shape=(24, 40, 48)):
    xs = [np.linspace(-1.5, 1.5, k) for k in shape]
    gx, gy, gz = np.meshgrid(*xs, indexing="ij")
    return jnp.asarray(
        (np.sqrt(gx ** 2 + gy ** 2 + gz ** 2) - 0.7).astype(np.float32))


def test_scan_matches_jnp():
    phi = _sdf()
    dx = 3.0 / 23
    h1 = 0.05 * dx * dx
    ref = minmax_flow_fixed(phi, dx, h1, 8, remat=False, use_pallas=False)
    out = minmax_scan_pallas(phi, dx, h1, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_while_loop_path_matches():
    phi = _sdf((16, 24, 32))
    dx = 3.0 / 15
    h1 = 0.05 * dx * dx
    ref = minmax_flow(phi, dx, h1, 6, 0.0, use_pallas=False)
    out = minmax_flow(phi, dx, h1, 6, 0.0, use_pallas=True)
    assert int(out.iterations) == int(ref.iterations)
    np.testing.assert_allclose(np.asarray(out.phi), np.asarray(ref.phi),
                               atol=2e-6, rtol=1e-5)


def test_gradient_matches():
    phi = _sdf((16, 24, 32))
    dx = 3.0 / 15
    h1 = 0.05 * dx * dx
    g1 = jax.grad(lambda p: jnp.sum(minmax_scan_pallas(p, dx, h1, 4) ** 2))(
        phi)
    g2 = jax.grad(lambda p: jnp.sum(
        minmax_flow_fixed(p, dx, h1, 4, use_pallas=False) ** 2))(phi)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=2e-5, rtol=1e-3)


def test_band_gate_freezes_far_field():
    phi = _sdf((16, 24, 32))
    dx = 3.0 / 15
    out = minmax_scan_pallas(phi, dx, 0.05 * dx * dx, 5, band_radius=4.1)
    far = np.abs(np.asarray(phi)) >= 4.1 * dx
    np.testing.assert_array_equal(np.asarray(out)[far],
                                  np.asarray(phi)[far])
