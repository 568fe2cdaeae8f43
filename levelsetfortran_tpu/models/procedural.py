"""Procedural triangle-mesh generators.

The reference ships two binary STL fixtures (cube40.stl, twoCube10.stl —
``README.md:5``) as its only test inputs; these generators produce exact
closed meshes of the analytic shapes in :mod:`.analytic`, so tests and
demos can validate against known signed-distance fields at any resolution
without binary fixtures.
"""

from __future__ import annotations

import numpy as np

from ..io.stl import SurfaceMesh


def _orient_outward(verts: np.ndarray, faces: np.ndarray,
                    center) -> np.ndarray:
    """Flip any triangle whose normal points toward ``center`` — valid for
    star-shaped solids (box, sphere), where outward == away from center."""
    c = np.asarray(center, np.float64)
    tri = verts[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    outward = np.einsum("ij,ij->i", n, tri.mean(axis=1) - c) >= 0
    fixed = faces.copy()
    fixed[~outward] = fixed[~outward][:, [0, 2, 1]]
    return fixed


def _as_mesh(vertices: np.ndarray, faces: np.ndarray) -> SurfaceMesh:
    n = faces.shape[0]
    return SurfaceMesh(
        vertices=np.asarray(vertices, np.float64),
        elements=np.asarray(faces, np.int32),
        elem_order=np.ones(n, np.int32),
        elem_tag=np.zeros(n, np.int32),
        bnd_normals=np.zeros((1, 3), np.float64),
    )


def box_mesh(center=(0.0, 0.0, 0.0), half_extent=(0.5, 0.5, 0.5),
             subdivisions: int = 1) -> SurfaceMesh:
    """Axis-aligned box as a closed triangle mesh, each face an
    n x n quad grid split into triangles (outward orientation)."""
    c = np.asarray(center, np.float64)
    h = np.asarray(half_extent, np.float64)
    n = max(1, int(subdivisions))
    verts = []
    faces = []
    u = np.linspace(-1.0, 1.0, n + 1)

    def add_face(axis, sign):
        base = len(verts)
        a1, a2 = [a for a in range(3) if a != axis]
        for i in range(n + 1):
            for j in range(n + 1):
                p = np.zeros(3)
                p[axis] = sign
                p[a1] = u[i]
                p[a2] = u[j]
                verts.append(c + h * p)
        for i in range(n):
            for j in range(n):
                v00 = base + i * (n + 1) + j
                v01 = v00 + 1
                v10 = v00 + (n + 1)
                v11 = v10 + 1
                faces.append([v00, v10, v11])
                faces.append([v00, v11, v01])
    for axis in range(3):
        for sign in (+1.0, -1.0):
            add_face(axis, sign)
    va = np.asarray(verts)
    fa = _orient_outward(va, np.asarray(faces, np.int32), c)
    return _as_mesh(va, fa)


def icosphere_mesh(center=(0.0, 0.0, 0.0), radius: float = 0.5,
                   subdivisions: int = 2) -> SurfaceMesh:
    """Geodesic sphere: subdivided icosahedron projected to the sphere."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]],
                 np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                  [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                  [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                  [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
                 np.int32)
    for _ in range(max(0, int(subdivisions))):
        edge_mid = {}
        verts = list(v)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                m = verts[a] + verts[b]
                m /= np.linalg.norm(m)
                edge_mid[key] = len(verts)
                verts.append(m)
            return edge_mid[key]

        new_f = []
        for a, b, c in f:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_f += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.asarray(verts)
        f = np.asarray(new_f, np.int32)
    verts = np.asarray(center, np.float64) + radius * v
    f = _orient_outward(verts, f, center)
    return _as_mesh(verts, f)
