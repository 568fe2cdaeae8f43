"""Cartesian grid geometry.

Reference behavior being re-expressed (not ported): ``set3d.f90:89-173``
computes the surface bounding box, sizes a uniform grid with
``n = ceil(extent/dx) + 1`` points per axis plus ``pad`` extra cells on each
side, and materializes a dense (nx+1, ny+1, nz+1, 3) coordinate array.  Here
the grid is a small static dataclass; coordinates are generated lazily (XLA
fuses iota-based coordinate generation into consumers, so a dense coordinate
array never needs to live in HBM).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Grid3D:
    """A uniform axis-aligned 3D grid.

    ``shape`` counts grid *points* per axis (reference ``nx+1`` etc.: phi is
    allocated ``(0:nx, 0:ny, 0:nz)`` at ``set3d.f90:160``).
    """

    shape: Tuple[int, int, int]
    origin: Tuple[float, float, float]   # xLo (set3d.f90:156)
    dx: float

    @property
    def upper(self) -> Tuple[float, float, float]:
        return tuple(o + (n - 1) * self.dx for o, n in zip(self.origin, self.shape))

    @property
    def n_points(self) -> int:
        return int(np.prod(self.shape))

    @property
    def diag(self) -> float:
        """Length of the bbox diagonal of the *surface* extent is what the
        reference normalizes dt by (``set3d.f90:301``); see ``dxx``. For a
        grid built by :func:`from_bbox` that extent is stored separately."""
        ext = [(n - 1) * self.dx for n in self.shape]
        return math.sqrt(sum(e * e for e in ext))

    def axis_coords(self, axis: int, dtype=jnp.float32) -> jnp.ndarray:
        n = self.shape[axis]
        return self.origin[axis] + self.dx * jnp.arange(n, dtype=dtype)

    def coords(self, dtype=jnp.float32) -> jnp.ndarray:
        """Dense (nx, ny, nz, 3) coordinates — only for small grids/tests."""
        xs = [self.axis_coords(a, dtype) for a in range(3)]
        gx, gy, gz = jnp.meshgrid(*xs, indexing="ij")
        return jnp.stack([gx, gy, gz], axis=-1)

    def world_to_index(self, points: jnp.ndarray) -> jnp.ndarray:
        """Continuous (fractional) index coordinates of world-space points."""
        origin = jnp.asarray(self.origin, dtype=points.dtype)
        return (points - origin) / self.dx


def from_bbox(
    lo: Tuple[float, float, float],
    hi: Tuple[float, float, float],
    dx: float,
    pad_cells: int,
    multiple_of: Tuple[int, int, int] = (1, 1, 1),
) -> Grid3D:
    """Size a grid around a bounding box the way the reference does.

    ``set3d.f90:143-157``: ``n = ceil(extent/dx) + 1`` interior points, plus
    ``pad_cells`` cells added on *each* side; origin shifts down by
    ``pad_cells*dx``.

    ``multiple_of`` rounds each axis's point count UP to a multiple (extra
    far-field cells on the high side) so the grid block-shards evenly over a
    device mesh.
    """
    shape = []
    origin = []
    for a in range(3):
        n = int(math.ceil((hi[a] - lo[a]) / dx)) + 1
        shape.append(n + 2 * pad_cells)      # nx = n + 2*dd, points = nx+1 ...
        origin.append(lo[a] - pad_cells * dx)
    # Reference allocates phi(0:nx,...) => nx+1 points where nx = n + 2*dd.
    shape = tuple(-(-(s + 1) // m) * m
                  for s, m in zip(shape, multiple_of))
    return Grid3D(shape=shape, origin=tuple(origin), dx=dx)


def from_surface(vertices: np.ndarray, dx: float, pad_cells: int,
                 multiple_of: Tuple[int, int, int] = (1, 1, 1)) -> Grid3D:
    """Grid around a surface mesh's bbox (reference ``set3d.f90:103-157``)."""
    lo = tuple(float(v) for v in np.min(vertices, axis=0))
    hi = tuple(float(v) for v in np.max(vertices, axis=0))
    return from_bbox(lo, hi, dx, pad_cells, multiple_of)


def surface_diag(vertices: np.ndarray) -> float:
    """sqrt(ddx^2+ddy^2+ddz^2) over the surface bbox (set3d.f90:135-137,301).

    Used to normalize the pseudo-time step: ``dxx = dx / diag``."""
    ext = np.max(vertices, axis=0) - np.min(vertices, axis=0)
    return float(np.sqrt(np.sum(ext * ext)))
