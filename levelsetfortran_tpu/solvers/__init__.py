from .reinit import reinit, reinit_fixed, reinit_step, ReinitResult
from .minmax_flow import minmax_flow, minmax_flow_fixed, minmax_step, MinMaxResult
from .advect import advect_nodes, banded_gradient, AdvectResult
