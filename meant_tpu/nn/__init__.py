from .attention_modules import (RotaryAttention, TemporalAttention,
                                XPosAttention)
from .embeddings import RobertaEmbeddings
from .encoders import LanguageEncoder, TemporalEncoder, VisionEncoder
from .layers import LayerNorm, Linear, RMSNorm, gelu, make_norm
from .stack import (maybe_remat, scanned_stack, stack_encoder_params,
                    unstack_encoder_params)

__all__ = [
    "RotaryAttention", "TemporalAttention", "XPosAttention",
    "RobertaEmbeddings", "LanguageEncoder", "TemporalEncoder",
    "VisionEncoder", "LayerNorm", "Linear", "RMSNorm", "gelu", "make_norm",
    "maybe_remat", "scanned_stack", "stack_encoder_params",
    "unstack_encoder_params",
]
