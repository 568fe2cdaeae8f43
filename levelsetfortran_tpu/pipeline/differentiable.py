"""End-to-end differentiable pipeline: STL vertices -> pixels.

The BASELINE north star: compose the differentiable stages —
exact signed-distance init (``ops.init_sign``, vertex-differentiable),
eikonal reinitialization (``solvers.reinit``, rematerialized scan),
min/max smoothing (``solvers.minmax_flow``), and the sphere-traced
renderer (``render.sphere_trace``, implicit-function VJP) — into one
jittable function whose pixels carry gradients back to the input STL
vertex positions.  The reference pipeline (set3d.f90) computes the same
forward chain (minus rendering) with no gradient story at all.

The grid is a fixed (static-shape) argument: XLA needs static shapes, so
vertex gradients flow through the *field values*, not through grid sizing.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..grid.grid import Grid3D
from ..ops.init_sign import signed_distance_init
from ..render.sphere_trace import RenderResult, camera_rays, render
from ..solvers.minmax_flow import minmax_flow_fixed
from ..solvers.reinit import reinit_fixed


class DifferentiableRender(NamedTuple):
    image: jnp.ndarray
    depth: jnp.ndarray
    phi: jnp.ndarray


@partial(jax.jit, static_argnames=("grid", "reinit_steps", "minmax_steps",
                                   "height", "width", "n_march_steps",
                                   "use_pallas", "mesh"))
def render_from_vertices(vertices, elements, grid: Grid3D, *,
                         eye, target,
                         reinit_steps: int = 20, minmax_steps: int = 10,
                         reinit_cfl: float = 0.1, minmax_cfl: float = 0.01,
                         height: int = 64, width: int = 64,
                         n_march_steps: int = 64,
                         use_pallas="auto", mesh=None,
                         culling=None) -> DifferentiableRender:
    """Render the smoothed level set of a triangle mesh; pixels are
    differentiable w.r.t. ``vertices``.

    Every stage mirrors its reference counterpart (stage order of
    set3d.f90:85-654) in fixed-step differentiable form; the renderer has
    no reference counterpart (BASELINE requirement).

    With ``mesh`` (a 3D ``jax.sharding.Mesh``): init runs block-sharded
    (vertices replicated), reinit/min-max run as shard_map fixed-step
    solvers with ppermute halo exchange, and the vertex cotangent is
    psum-all-reduced across shards by shard_map's transpose during the
    backward stencil sweep — the sharded reverse-mode path.
    """
    dx = grid.dx
    if mesh is not None:
        from ..ops.init_sign import signed_distance_init_sharded
        from ..parallel.sharded import (minmax_fixed_sharded,
                                        reinit_fixed_sharded)
        phi0 = signed_distance_init_sharded(grid, vertices,
                                            jnp.asarray(elements), mesh,
                                            dtype=vertices.dtype,
                                            culling=culling)
        phi = reinit_fixed_sharded(mesh, phi0, dx, reinit_cfl * dx,
                                   reinit_steps, use_pallas=use_pallas)
        if minmax_steps:
            phi = minmax_fixed_sharded(mesh, phi, dx,
                                       minmax_cfl * dx * dx, minmax_steps,
                                       use_pallas=use_pallas)
    else:
        phi0 = signed_distance_init(grid, vertices, jnp.asarray(elements),
                                    dtype=vertices.dtype, culling=culling)
        phi = reinit_fixed(phi0, dx, reinit_cfl * dx, reinit_steps,
                           use_pallas=use_pallas)
        if minmax_steps:
            phi = minmax_flow_fixed(phi, dx, minmax_cfl * dx * dx,
                                    minmax_steps, use_pallas=use_pallas)
    origins, dirs = camera_rays(height, width, eye=eye, target=target,
                                dtype=phi.dtype)
    out: RenderResult = render(phi, grid, origins, dirs,
                               n_steps=n_march_steps, hit_tol=0.25 * dx)
    return DifferentiableRender(image=out.image, depth=out.depth, phi=phi)


def image_loss_and_vertex_grad(vertices, elements, grid: Grid3D,
                               target_image, **kw):
    """Convenience: L2 pixel loss against a target image and its gradient
    w.r.t. vertex positions — the end-to-end check BASELINE gates on."""

    def loss(v):
        out = render_from_vertices(v, elements, grid, **kw)
        return 0.5 * jnp.sum((out.image - target_image) ** 2)

    return jax.value_and_grad(loss)(vertices)
