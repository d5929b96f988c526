from .loader import ArrayLoader

__all__ = ["ArrayLoader"]
