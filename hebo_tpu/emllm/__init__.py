from .attention import EMLLMAttention, masked_attention
from .memory import EpisodicKVMemory, retrieve_sharded
from .segmentation import refine_boundaries, segment_events, surprise_boundaries
