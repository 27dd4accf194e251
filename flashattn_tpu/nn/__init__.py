from . import functional
from .basic import Dropout, Embedding, FusedLayerNorm, LayerNorm1d, Linear
