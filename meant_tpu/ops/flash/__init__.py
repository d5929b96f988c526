from .flash_attention import flash_attention
from .kernel import flash_mha

__all__ = ["flash_attention", "flash_mha"]
