"""Pinned reference-parity regression gates (SURVEY.md §7, last bullet).

No gfortran exists in this environment, so the committed goldens
(tests/golden/*.npz, produced by tools/make_parity_golden.py from the
REFERENCE_PARITY configuration: float64, all reference quirks on) are the
stand-in for the reference binary's output on the two bundled STLs
(BASELINE configs 1-2).  A numerics regression in the parity path now
fails an allclose gate instead of only the "quirks change something"
smoke check.  Per-quirk impact is recorded in PARITY_QUIRKS.md.
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

# f32 storage quantization of the f64 fields is ~3e-7 (fields are O(5));
# the gate is BASELINE's 1e-5 convergence tolerance.
ATOL = 1e-5


def _load(name):
    path = os.path.join(GOLDEN_DIR, f"parity_{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden {path} not generated")
    return np.load(path)


def test_twocube10_parity_matches_golden():
    from levelsetfortran_tpu.config import REFERENCE_PARITY
    from levelsetfortran_tpu.pipeline.run import run

    g = _load("twocube10")
    res = run("/root/reference/twoCube10.stl", REFERENCE_PARITY,
              write_outputs=False)
    assert res.reinit_iters == int(g["reinit_iters"])
    assert res.minmax_iters == int(g["minmax_iters"])
    np.testing.assert_allclose(res.phi_init, g["phi_init"], atol=ATOL)
    np.testing.assert_allclose(res.phi_smoothed, g["phi_smoothed"],
                               atol=ATOL)
    np.testing.assert_allclose(res.advected, g["advected"], atol=1e-8)
    np.testing.assert_allclose(res.asymptotic_error,
                               float(g["asymptotic_error"]), atol=1e-9)


@pytest.mark.skipif(not os.environ.get("RUN_SLOW_PARITY"),
                    reason="cube40 parity gate is slow (O(grid x 18k "
                           "triangles) init on CPU); set RUN_SLOW_PARITY=1")
def test_cube40_sdf_parity_matches_golden():
    """BASELINE config 1: cube40 reduced SDF-only mode (README.md:25)."""
    from levelsetfortran_tpu.config import REFERENCE_PARITY
    from levelsetfortran_tpu.pipeline.run import run

    g = _load("cube40_sdf")
    cfg = REFERENCE_PARITY.replace(minmax_iters=0, advect_iters=0,
                                   final_reinit_iters=0)
    res = run("/root/reference/cube40.stl", cfg, write_outputs=False)
    assert res.reinit_iters == int(g["reinit_iters"])
    np.testing.assert_allclose(res.phi_init, g["phi_init"], atol=ATOL)
