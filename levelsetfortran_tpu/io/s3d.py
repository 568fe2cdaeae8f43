"""Strand3dFC surface-mesh (.s3d) format.

The reference writes this format inline (``set3d.f90:588-612``): a header line
``nSurfElem nSurfNode nBndElem nBndComp``, one line per element
``order n1 n2 n3 tag`` with 0-based connectivity (``set3d.f90:590-594``
converts from 1-based before writing), one line per node with advected
coordinates, and one line per boundary component with its normal.

The reference's ``s3dRead`` is an unimplemented stub that STOPs
(``subs.f90:127-147``); here reading is implemented for real, completing the
promised round-trip.
"""

from __future__ import annotations

import numpy as np

from .stl import SurfaceMesh


def write_s3d(path: str, mesh: SurfaceMesh,
              coords: np.ndarray | None = None) -> None:
    """Write mesh connectivity plus (optionally advected) node coordinates."""
    coords = mesh.vertices if coords is None else np.asarray(coords)
    with open(path, "w") as f:
        f.write(f" {mesh.n_elems} {mesh.n_nodes} {mesh.n_bnd_elem}"
                f" {mesh.bnd_normals.shape[0]}\n")
        for k in range(mesh.n_elems):
            e = mesh.elements[k]
            f.write(f" {mesh.elem_order[k]} {e[0]} {e[1]} {e[2]}"
                    f" {mesh.elem_tag[k]}\n")
        for n in range(mesh.n_nodes):
            x, y, z = coords[n]
            f.write(f" {x:23.16E} {y:23.16E} {z:23.16E}\n")
        for n in range(mesh.bnd_normals.shape[0]):
            x, y, z = mesh.bnd_normals[n]
            f.write(f" {x:23.16E} {y:23.16E} {z:23.16E}\n")


def read_s3d(path: str) -> SurfaceMesh:
    """Read a .s3d file (implements the reference's stubbed s3dRead)."""
    with open(path) as f:
        tokens_per_line = [line.split() for line in f if line.strip()]
    n_elems, n_nodes, n_bnd_elem, n_bnd_comp = (
        int(v) for v in tokens_per_line[0][:4])

    rows = tokens_per_line[1:1 + n_elems]
    elem_order = np.array([int(r[0]) for r in rows], dtype=np.int32)
    elements = np.array([[int(r[1]), int(r[2]), int(r[3])] for r in rows],
                        dtype=np.int32)
    elem_tag = np.array([int(r[4]) for r in rows], dtype=np.int32)

    node_rows = tokens_per_line[1 + n_elems:1 + n_elems + n_nodes]
    vertices = np.array([[float(v) for v in r[:3]] for r in node_rows],
                        dtype=np.float64)

    bnd_rows = tokens_per_line[1 + n_elems + n_nodes:
                               1 + n_elems + n_nodes + n_bnd_comp]
    bnd_normals = np.array([[float(v) for v in r[:3]] for r in bnd_rows],
                           dtype=np.float64)
    if bnd_normals.size == 0:
        bnd_normals = np.zeros((1, 3), dtype=np.float64)

    return SurfaceMesh(
        vertices=vertices, elements=elements, elem_order=elem_order,
        elem_tag=elem_tag, bnd_normals=bnd_normals, n_bnd_elem=n_bnd_elem)
