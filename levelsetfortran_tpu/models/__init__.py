from .analytic import (
    sdf_sphere, sdf_box, sdf_torus, sdf_union, sdf_two_cubes,
    box_mesh, icosphere_mesh, two_cubes_mesh,
)
