"""kaolin_tpu: a TPU-native differentiable 3D rendering and 3D-ops framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of NVIDIA Kaolin
(reference: ``kaolin/__init__.py:1-7``): packages ``io``, ``metrics``, ``ops``,
``render``, ``rep``, ``utils``, ``visualize`` — functional core, pytree
containers, Pallas kernels on the hot paths, and pjit/shard_map pixel/ray
sharding across TPU meshes (the ``parallel`` package, new in this framework).
"""

from . import io
from . import metrics
from . import ops
from . import parallel
from . import render
from . import rep
from . import utils
from . import visualize

__version__ = '0.1.0'
