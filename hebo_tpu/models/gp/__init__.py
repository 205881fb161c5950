from .gp import GP, GPCore, GPParams, GPData, GPCache, WarpedGP
from .svgp import SVGP, SVGPParams
from . import kernels, inference
