from .grid import Grid3D, from_bbox, from_surface, surface_diag
