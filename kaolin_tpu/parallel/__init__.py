from .mesh import make_mesh, Mesh, P
from .render import sharded_rasterize, sharded_dibr_rasterization
from .spc import sharded_raytrace
