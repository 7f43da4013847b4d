from .mesh import make_mesh, Mesh, P
from .distributed import init_distributed, is_distributed
from .render import sharded_rasterize, sharded_dibr_rasterization
from .spc import sharded_raytrace
from .metrics import (sharded_sided_distance, sharded_chamfer_distance,
                      sharded_point_to_mesh_distance)
