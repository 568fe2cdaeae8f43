from .band import narrow_band
from .derivs import first_derivative, second_derivative, laplacian
from .init_sign import (initialize_sign_field, signed_distance_init,
    nearest_centroid, nearest_triangle, point_triangle_closest,
    orientation_sign)
from .interp import trilinear, sample_surface
from .minmax import minmax_rhs, mean_curvature, seven_point_average
from .sign import smeared_sign, hard_sign
from .stencil import shift, interior_mask, boundary_extrapolate
from .weno import weno_godunov, weno_derivatives, godunov_select
