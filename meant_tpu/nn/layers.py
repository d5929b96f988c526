"""Basic linen layers with torch-compatible defaults.

The reference relies on torch defaults (kaiming-uniform Linear init, exact-erf
GELU, N(0,1) embedding init) in the top-level tree and xavier-uniform +
zero-bias in the src tree (`src/meant/meant.py` `_initialize_weights`,
`src/utils/torchUtils.py:9-16`). Both init styles are provided so trained-from-
scratch behavior tracks whichever generation a model mirrors.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from meant_tpu.ops import layer_norm as _layer_norm_fn
from meant_tpu.ops import rms_norm as _rms_norm_fn

# torch nn.Linear default: W, b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                     "uniform")
xavier_kernel_init = nn.initializers.xavier_uniform()


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Linear(nn.Module):
    """Dense layer; init_style 'torch' (default) or 'xavier' (src-era)."""
    features: int
    in_features: int
    use_bias: bool = True
    init_style: str = "torch"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.init_style == "xavier":
            kernel_init, bias_init = xavier_kernel_init, nn.initializers.zeros
        else:
            kernel_init = torch_kernel_init
            bias_init = torch_bias_init(self.in_features)
        return nn.Dense(self.features, use_bias=self.use_bias,
                        kernel_init=kernel_init, bias_init=bias_init,
                        dtype=self.dtype, name="dense")(x)


class RMSNorm(nn.Module):
    """Zhang & Sennrich RMSNorm, reference semantics (`utils/rms_norm.py`)."""
    d: int
    p: float = -1.0
    eps: float = 1e-8
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.d,))
        offset = (self.param("offset", nn.initializers.zeros, (self.d,))
                  if self.use_bias else None)
        return _rms_norm_fn(x, scale, offset=offset, p=self.p, eps=self.eps)


class LayerNorm(nn.Module):
    """torch.nn.LayerNorm semantics (eps=1e-5 default)."""
    d: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.d,))
        offset = self.param("offset", nn.initializers.zeros, (self.d,))
        return _layer_norm_fn(x, scale, offset, eps=self.eps)


def make_norm(kind: str, d: int, name: str):
    if kind == "rms":
        return RMSNorm(d, name=name)
    if kind == "layer":
        return LayerNorm(d, name=name)
    raise ValueError(f"unknown norm kind {kind}")


def gelu(x):
    """Exact-erf GELU (torch nn.GELU default). jax.nn.gelu defaults to the
    tanh approximation — that difference alone breaks 1e-3 logit parity."""
    return jax.nn.gelu(x, approximate=False)
