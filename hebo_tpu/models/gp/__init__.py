from .gp import GP, GPCore, GPParams, GPData, GPCache
from . import kernels
