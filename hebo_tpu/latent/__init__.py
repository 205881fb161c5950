from .lbo import LatentSpaceBO
from .vae import VAE, metric_loss, rank_weights, train_vae
from .decoders import (
    ImageLatentBO, SeqVAE, TopologyVAE, seq_decode, seq_encode,
    topology_decode, topology_encode, train_seq_vae, train_topology_vae,
)
