from . import camera
from . import mesh
from . import spc
from . import lighting
