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


def test_gradient_wrt_scalars_matches():
    """The hand adjoint's scalar cotangents (dx through 1/dx^2, h1 through
    the Euler update) must match the jnp VJP; band_radius/threshold enter
    through booleans only and must be exactly zero."""
    phi = _sdf((16, 24, 32))
    dx = 3.0 / 15
    h1 = 0.05 * dx * dx

    def loss(fn):
        def run(d, hh, br, th):
            return jnp.sum(fn(phi, d, hh, br, th) ** 2)
        return jax.grad(run, argnums=(0, 1, 2, 3))(
            jnp.float32(dx), jnp.float32(h1), jnp.float32(4.1),
            jnp.float32(0.0))

    gp = loss(lambda p, d, hh, br, th: minmax_scan_pallas(
        p, d, hh, 3, band_radius=br, threshold=th))
    gj = loss(lambda p, d, hh, br, th: minmax_flow_fixed(
        p, d, hh, 3, band_radius=br, threshold=th, use_pallas=False))
    np.testing.assert_allclose(float(gp[0]), float(gj[0]), rtol=2e-3)
    np.testing.assert_allclose(float(gp[1]), float(gj[1]), rtol=2e-3)
    assert float(gp[2]) == 0.0 and float(gp[3]) == 0.0
    assert float(gj[2]) == 0.0 and float(gj[3]) == 0.0


def test_gradient_sqrtn_checkpointing(monkeypatch):
    """sqrt-N-checkpointed min/max backward == flat-stash backward."""
    from levelsetfortran_tpu.ops import weno_pallas as wp
    phi = _sdf((16, 24, 32))
    dx = 3.0 / 15
    h1 = 0.05 * dx * dx

    def loss(p):
        return jnp.sum(minmax_scan_pallas(p, dx, h1, 5) ** 2)

    g_flat = jax.grad(loss)(phi)
    monkeypatch.setattr(wp, "_FLAT_TRAJ_BYTES", 0)
    g_sqrt = jax.grad(loss)(phi)
    np.testing.assert_allclose(np.asarray(g_sqrt), np.asarray(g_flat),
                               atol=1e-7, rtol=1e-6)


def test_band_gate_freezes_far_field():
    phi = _sdf((16, 24, 32))
    dx = 3.0 / 15
    out = minmax_scan_pallas(phi, dx, 0.05 * dx * dx, 5, band_radius=4.1)
    far = np.abs(np.asarray(phi)) >= 4.1 * dx
    np.testing.assert_array_equal(np.asarray(out)[far],
                                  np.asarray(phi)[far])


def test_banded_scan_matches_dense_forward_and_grad():
    """Banded differentiable min/max scan (VERDICT r4 next #4): identical
    VALUES to the dense fused scan (banded min/max IS the dense function)
    and matching gradients — frozen tiles are identity passthroughs in
    the adjoint (minmax_bwd_padded's banded mode)."""
    import numpy as np
    from levelsetfortran_tpu.ops.minmax_pallas import minmax_scan_pallas
    n = (32, 32, 32)
    xs = np.linspace(-1, 1, 32)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    phi0 = jnp.asarray((np.sqrt((gx + 0.5) ** 2 + gy ** 2 + gz ** 2)
                        - 0.25).astype(np.float32))
    dx = 2.0 / 31
    h1 = 0.01 * dx * dx
    kw = dict(band_radius=4.1, threshold=0.0, tile=(8, 8))
    dense = minmax_scan_pallas(phi0, dx, h1, 7, **kw)
    banded = minmax_scan_pallas(phi0, dx, h1, 7, banded=True,
                                refresh_every=3, **kw)
    np.testing.assert_array_equal(np.asarray(banded), np.asarray(dense))

    w = jnp.asarray(np.random.default_rng(1).standard_normal(n), jnp.float32)
    g_d = jax.grad(lambda p: jnp.sum(
        w * minmax_scan_pallas(p, dx, h1, 7, **kw)))(phi0)
    g_b = jax.grad(lambda p: jnp.sum(
        w * minmax_scan_pallas(p, dx, h1, 7, banded=True, refresh_every=3,
                               **kw)))(phi0)
    assert float(jnp.max(jnp.abs(g_d))) > 0
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_d),
                               atol=1e-6, rtol=1e-5)
