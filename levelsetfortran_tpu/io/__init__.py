from .stl import SurfaceMesh, read_stl, write_stl
from .vti import read_vti, write_vti
from .s3d import read_s3d, write_s3d
