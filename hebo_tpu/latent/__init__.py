from .lbo import LatentSpaceBO
from .vae import VAE, metric_loss, rank_weights, train_vae
