from .nap import NAPSurrogate, TransformerNP, meta_train_np, sample_gp_tasks
