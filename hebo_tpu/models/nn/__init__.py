from .deep_ensemble import DeepEnsemble
