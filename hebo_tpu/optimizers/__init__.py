from .base import AbstractOptimizer
from .hebo import HEBO
