"""Temporal antecedent-lag attention (functional core).

The MEANT temporal stage attends from ONLY the target (last) lag day to all
lag days ("The query matrix in the attention mechanism only acts upon the
target day", paper §3.5.1). Two reference variants exist:

* paper/top-level (`meant/temporal.py:34-60`): q = proj(input[:, l-1, :]),
  scale 1/sqrt(Dh * h), output rearranged 'b h l d -> b l (h d)' with l == 1,
  i.e. shape (b, 1, dim) — the lag axis collapses to the single target day.
* src-era (`src/meant/temporal.py:38-74`): q = proj(input[:, -1, :]),
  scale 1/sqrt(Dh), optional xPos rotation on q/k that is an identity in
  practice (q_len == 1 => position 0, centered => cos=1, sin=0, scale=1; see
  meant_tpu/ops/rotary.rotate_queries_and_keys), output rearranged
  'b h l d -> b (l h d)', i.e. shape (b, dim) flat.

Because lag is tiny (5), this is a skinny matmul pair — XLA fuses it into the
surrounding projections; a Pallas kernel would add launch overhead for no HBM
saving. The functional core below is shared by both module variants.
"""

from __future__ import annotations

import jax.numpy as jnp

from .attention import attend


def lag_attend(q_last: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
               scale: float) -> jnp.ndarray:
    """q_last: (b, h, 1, d) — the target-day query. k, v: (b, h, lag, d).
    Returns (b, h, 1, d)."""
    return attend(q_last, k, v, scale=scale, causal=False)
