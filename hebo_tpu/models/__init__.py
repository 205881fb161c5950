from .base import (
    BaseModel, MODEL_REGISTRY, MultiTaskModel, get_model, get_model_class,
    register_model,
)
from .gp.gp import GP, WarpedGP
from .gp.svgp import SVGP
from .nn.deep_ensemble import DeepEnsemble
from .rf import RF
from .linreg import LinRegModel
from .gp.rd_gp import RDGP
from .gp.uncertain_gp import UncertainGP
from .nn.ensembles_ext import ConditionalDeepEnsemble, GumbelDeepEnsemble, MCBNEnsemble
from .gp.dkl import DKLGP
from .nn.eac import EACEnsemble
from .boosting import GBDT
