from . import testing
from . import checkpoint
