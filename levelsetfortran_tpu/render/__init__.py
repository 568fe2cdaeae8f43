from .sphere_trace import (
    render, trace_depth, camera_rays, surface_normal, RenderResult)
