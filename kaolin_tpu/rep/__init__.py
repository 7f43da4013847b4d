from .spc import Spc
