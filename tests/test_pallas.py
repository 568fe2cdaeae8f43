"""Fused Pallas reinit kernel vs the jnp reference path.

Runs in Pallas interpret mode on CPU (conftest forces the cpu backend), so
these tests validate the kernel's math, masking, padded layout, and VJP
wiring without TPU hardware; the same kernel compiles via Mosaic on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from levelsetfortran_tpu.ops.weno import default_eps_floor
from levelsetfortran_tpu.ops.weno_pallas import (
    _reinit_step_jnp, reinit_scan_pallas, reinit_step_pallas)
from levelsetfortran_tpu.solvers.reinit import reinit, reinit_fixed


def _field(shape, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    xs = [np.linspace(-1, 1, k) for k in shape]
    gx, gy, gz = np.meshgrid(*xs, indexing="ij")
    phi = np.sqrt(gx ** 2 + gy ** 2 + gz ** 2) - 0.5
    phi = 2.0 * phi + 0.01 * rng.standard_normal(shape)
    return jnp.asarray(phi.astype(dtype))


@pytest.mark.parametrize("shape", [(16, 32, 64), (13, 41, 61)])
def test_step_matches_jnp(shape):
    phi = _field(shape)
    dx, h = 0.05, 0.005
    ef = default_eps_floor(phi.dtype)
    ref = _reinit_step_jnp(phi, phi, jnp.float32(dx), jnp.float32(h),
                           1e-6, ef, False)
    out = reinit_step_pallas(phi, phi, dx, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6, rtol=1e-5)


def test_scan_matches_fixed_steps():
    phi = _field((13, 41, 61), seed=1)
    dx, h = 0.05, 0.005
    ref = reinit_fixed(phi, dx, h, 5, remat=False, use_pallas=False)
    out = reinit_scan_pallas(phi, dx, h, 5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_scan_quirk_flag():
    phi = _field((12, 24, 32), seed=2)
    dx, h = 0.05, 0.005
    ref = reinit_fixed(phi, dx, h, 3, remat=False, use_pallas=False,
                       quirk_y_p5_zero=True)
    out = reinit_scan_pallas(phi, dx, h, 3, quirk_y_p5_zero=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # and the quirk must actually change something
    out_noq = reinit_scan_pallas(phi, dx, h, 3)
    assert float(jnp.max(jnp.abs(out - out_noq))) > 0.0


def test_solver_forced_pallas_while_loop():
    phi = _field((12, 24, 32), seed=3)
    dx, h = 0.05, 0.005
    ref = reinit(phi, dx, h, 4, 0.0, use_pallas=False)
    out = reinit(phi, dx, h, 4, 0.0, use_pallas=True)
    assert int(out.iterations) == int(ref.iterations) == 4
    np.testing.assert_allclose(np.asarray(out.phi), np.asarray(ref.phi),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_scan_gradient_matches_jnp():
    phi = _field((12, 24, 32), seed=4)
    dx, h = 0.05, 0.005

    def loss_pallas(p):
        return jnp.sum(reinit_scan_pallas(p, dx, h, 3) ** 2)

    def loss_jnp(p):
        return jnp.sum(
            reinit_fixed(p, dx, h, 3, remat=False, use_pallas=False) ** 2)

    g1 = jax.grad(loss_pallas)(phi)
    g2 = jax.grad(loss_jnp)(phi)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_scan_gradient_sqrtn_checkpointing(monkeypatch):
    """The two-level (sqrt-N) checkpointed backward must produce the SAME
    gradient as the flat trajectory stash — forcing the sqrt path by
    shrinking the flat-stash byte budget to zero (VERDICT r2 #2)."""
    from levelsetfortran_tpu.ops import weno_pallas as wp
    phi = _field((12, 24, 32), seed=7)
    dx, h = 0.05, 0.005
    steps = 5   # segments [3, 2]: exercises the remainder segment

    def loss(p):
        return jnp.sum(reinit_scan_pallas(p, dx, h, steps) ** 2)

    g_flat = jax.grad(loss)(phi)
    monkeypatch.setattr(wp, "_FLAT_TRAJ_BYTES", 0)
    g_sqrt = jax.grad(loss)(phi)
    assert wp._segments(steps) == [3, 2]
    np.testing.assert_allclose(np.asarray(g_sqrt), np.asarray(g_flat),
                               atol=1e-6, rtol=1e-6)
    # scalar cotangents too
    gd_flat_fn = jax.grad(lambda d: jnp.sum(
        reinit_scan_pallas(phi, d, h, steps)))
    monkeypatch.setattr(wp, "_FLAT_TRAJ_BYTES", 10 ** 12)
    gd_flat = gd_flat_fn(jnp.float32(dx))
    monkeypatch.setattr(wp, "_FLAT_TRAJ_BYTES", 0)
    gd_sqrt = gd_flat_fn(jnp.float32(dx))
    np.testing.assert_allclose(float(gd_sqrt), float(gd_flat),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_step_gradient_matches_jnp():
    """Single-step VJP (the _fused_bwd route, distinct from the scan's):
    phi and sign_src cotangents from the Pallas adjoint kernel vs jnp."""
    from levelsetfortran_tpu.ops.weno_pallas import default_eps_floor
    phi = _field((12, 24, 32), seed=8)
    sgn = _field((12, 24, 32), seed=9)
    dx, h = 0.05, 0.005
    ef = default_eps_floor(phi.dtype)

    def loss_pallas(p, s):
        return jnp.sum(reinit_step_pallas(p, s, dx, h) ** 2)

    def loss_jnp(p, s):
        return jnp.sum(_reinit_step_jnp(p, s, jnp.float32(dx),
                                        jnp.float32(h), 1e-6, ef,
                                        False) ** 2)

    g1p, g1s = jax.grad(loss_pallas, argnums=(0, 1))(phi, sgn)
    g2p, g2s = jax.grad(loss_jnp, argnums=(0, 1))(phi, sgn)
    np.testing.assert_allclose(np.asarray(g1p), np.asarray(g2p),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g1s), np.asarray(g2s),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_scan_gradient_wrt_scalars():
    """dx/h cotangents accumulate across tiles (SMEM scratch) and steps."""
    phi = _field((12, 24, 32), seed=10)

    def loss(fn):
        def inner(d, hh):
            return jnp.sum(fn(phi, d, hh) ** 2)
        return inner

    pall = loss(lambda p, d, hh: reinit_scan_pallas(p, d, hh, 2))
    ref = loss(lambda p, d, hh: reinit_fixed(p, d, hh, 2, remat=False,
                                             use_pallas=False))
    g1 = jax.grad(pall, argnums=(0, 1))(jnp.float32(0.05), jnp.float32(0.005))
    g2 = jax.grad(ref, argnums=(0, 1))(jnp.float32(0.05), jnp.float32(0.005))
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=2e-3)


def test_f64_falls_back_to_jnp():
    phi = _field((12, 24, 32), seed=5, dtype=np.float64)
    dx, h = 0.05, 0.005
    ref = reinit_fixed(phi, dx, h, 2, remat=False, use_pallas=False)
    out = reinit_fixed(phi, dx, h, 2, remat=False, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-12)


def test_ring_kernel_variant():
    """Force the +1-BC-ring kernel (tile chosen so a global face lands on
    a tile's first row) and check it still matches the jnp step."""
    phi = _field((17, 32, 64), seed=7)          # 17 % 8 == 1 -> ring
    dx, h = 0.05, 0.005
    ef = default_eps_floor(phi.dtype)
    ref = _reinit_step_jnp(phi, phi, jnp.float32(dx), jnp.float32(h),
                           1e-6, ef, False)
    out = reinit_step_pallas(phi, phi, dx, h, tile=(8, 32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6, rtol=1e-5)


@pytest.mark.slow
def test_auto_orientation_flat_grid():
    """Flat grids (short last axis) are auto-transposed so the long axis
    sits in lanes (best_axis_order): same result, ~3x less padded volume."""
    from levelsetfortran_tpu.ops.weno_pallas import (best_axis_order,
                                                     inverse_perm)
    assert best_axis_order((262, 42, 42)) != (0, 1, 2)
    assert best_axis_order((256, 256, 256)) == (0, 1, 2)
    for shape in [(262, 42, 42), (40, 64, 24)]:
        p = best_axis_order(shape)
        assert inverse_perm(p)[p[0]] == 0
        # re-orienting an already-oriented shape is a no-op (no recursion)
        assert best_axis_order(tuple(shape[i] for i in p)) == (0, 1, 2)

    phi = _field((64, 24, 24), seed=11)
    dx, h = 0.05, 0.005
    ref = reinit_fixed(phi, dx, h, 3, remat=False, use_pallas=False)
    out = reinit_scan_pallas(phi, dx, h, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # gradients flow through the orientation transposes
    g1 = jax.grad(lambda p: jnp.sum(reinit_scan_pallas(p, dx, h, 2) ** 2))(phi)
    g2 = jax.grad(lambda p: jnp.sum(
        reinit_fixed(p, dx, h, 2, remat=False, use_pallas=False) ** 2))(phi)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=2e-4, rtol=1e-3)


def test_auto_orientation_solver_paths():
    """The while-loop solvers (reinit, minmax, narrow band) agree with the
    jnp path on a flat grid where orientation kicks in."""
    from levelsetfortran_tpu.solvers.minmax_flow import minmax_flow
    from levelsetfortran_tpu.solvers.reinit import reinit_narrowband

    phi = _field((64, 24, 24), seed=12)
    dx, h = 0.05, 0.005
    ref = reinit(phi, dx, h, 3, 0.0, use_pallas=False)
    out = reinit(phi, dx, h, 3, 0.0, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out.phi), np.asarray(ref.phi),
                               atol=1e-5, rtol=1e-5)
    nb = reinit_narrowband(phi, dx, h, 3, 0.0, refresh_every=3,
                           use_pallas=True)
    assert np.isfinite(np.asarray(nb.phi)).all()
    mref = minmax_flow(phi, dx, 1e-4, 3, 0.0, use_pallas=False)
    mout = minmax_flow(phi, dx, 1e-4, 3, 0.0, use_pallas=True)
    np.testing.assert_allclose(np.asarray(mout.phi), np.asarray(mref.phi),
                               atol=1e-5, rtol=1e-5)


def test_fused_rms_scalar_matches_manual():
    """with_rms=True returns sum((out - in)^2) over TRUE grid cells,
    accumulated inside the kernel across tiles (incl. odd shapes whose
    padded layout has round-up cells that must not contribute)."""
    from levelsetfortran_tpu.ops import weno_pallas as wp

    for shape in [(16, 32, 64), (13, 41, 61)]:
        phi = _field(shape, seed=11)
        dx, h = 0.05, 0.005
        tile = wp._pick_tile(shape)
        pp = wp.pad_for_pallas(phi, tile)
        kw = dict(gshape=shape, eps_scale=1e-6,
                  eps_floor=default_eps_floor(phi.dtype),
                  quirk_y_p5_zero=False, tile=tile, interpret=True)
        out_plain = wp._pallas_step_padded(pp, pp, jnp.float32(dx),
                                           jnp.float32(h), **kw)
        out, dsq = wp._pallas_step_padded(pp, pp, jnp.float32(dx),
                                          jnp.float32(h), with_rms=True,
                                          **kw)
        a = np.asarray(wp.crop_from_pallas(out, shape))
        b = np.asarray(wp.crop_from_pallas(out_plain, shape))
        np.testing.assert_array_equal(a, b)
        manual = float(np.sum((a - np.asarray(phi)) ** 2))
        np.testing.assert_allclose(float(dsq), manual, rtol=1e-5)


def test_banded_axis_order_keeps_sparse_axis_tiled():
    """Flat two-body geometry: the band-sparse long axis must stay in the
    TILED dims (lane-axis sparsity is unusable by the tile skip), even
    though the dense-volume-optimal order would put it in lanes."""
    from levelsetfortran_tpu.ops.weno_pallas import (banded_axis_order,
                                                     best_axis_order)

    nx, ny, nz = 512, 32, 32
    xs = np.linspace(-3.0, 3.0, nx, dtype=np.float32)
    ys = np.linspace(-0.5, 0.5, ny, dtype=np.float32)
    zs = np.linspace(-0.5, 0.5, nz, dtype=np.float32)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    phi = jnp.asarray(np.minimum(
        np.sqrt((gx + 2.5) ** 2 + gy ** 2 + gz ** 2) - 0.2,
        np.sqrt((gx - 2.5) ** 2 + gy ** 2 + gz ** 2) - 0.2))
    dx = float(xs[1] - xs[0])

    assert best_axis_order(phi.shape)[2] == 0   # volume-optimal: x in lanes
    perm = banded_axis_order(phi, dx, 8.1, 0.5)
    assert perm[2] != 0, perm                   # band-aware: x stays tiled


def test_hand_pair_forward_matches_weno5_pair():
    """The hand-adjoint's recomputed forward (``_weno5_pair_hand``) must
    agree with the forward kernel's ``_weno5_pair`` to f32 ulp: the bwd
    kernel recomputes WENO weights via the hand path, so a sub-tolerance
    forward divergence would silently bias cotangents (VERDICT r3 #10a).

    Covers random diffs, flat fields (all-zero diffs), exact ties in the
    epsilon/weight max chains, and the y-quirk epsilon variant.
    """
    from levelsetfortran_tpu.ops.weno_pallas import (_weno5_pair,
                                                     _weno5_pair_hand)

    rng = np.random.default_rng(7)
    blocks = [rng.standard_normal((6, 256)).astype(np.float32)]
    # flat field: every diff zero (weights symmetric, epsilon-floored)
    blocks.append(np.zeros((6, 256), np.float32))
    # ties: repeated magnitudes so the max chains hit exact equality
    tied = rng.choice([-1.0, 0.0, 1.0, 2.0], size=(6, 256)).astype(np.float32)
    blocks.append(tied)
    ps = [jnp.asarray(np.concatenate([b[i] for b in blocks])) for i in range(6)]

    for p5_zero in (False, True):
        for eps_floor in (1e-12, 1e-18):
            wm_a, wp_a = _weno5_pair(*ps, 1e-6, eps_floor, 1e-7, p5_zero)
            wm_b, wp_b, _ = _weno5_pair_hand(*ps, 1e-6, eps_floor, 1e-7,
                                             p5_zero)
            np.testing.assert_array_equal(np.asarray(wm_a), np.asarray(wm_b))
            np.testing.assert_array_equal(np.asarray(wp_a), np.asarray(wp_b))
