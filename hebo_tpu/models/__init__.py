from .base import BaseModel, MODEL_REGISTRY, get_model, get_model_class, register_model, MultiTaskModel
from .gp.gp import GP
