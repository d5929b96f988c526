from .attention import attend, attend_bshd, merge_heads, split_heads
from .norms import layer_norm, rms_norm
from .rotary import (apply_rot_emb_sincos, apply_rotary, axial_rotary_sincos,
                     frame_rotary_sincos, lang_freqs, make_freqs, pixel_freqs,
                     rope_angles, rotate_half, rotate_queries_and_keys,
                     rotate_queries_or_keys, xpos_scale)
from .patch import patchify
from .ring import ring_attend, ring_attention_local
from .temporal import lag_attend

__all__ = [
    "attend", "attend_bshd", "merge_heads", "split_heads", "layer_norm",
    "rms_norm",
    "apply_rot_emb_sincos", "apply_rotary", "axial_rotary_sincos",
    "frame_rotary_sincos", "lang_freqs", "make_freqs", "pixel_freqs",
    "rope_angles", "rotate_half", "rotate_queries_and_keys",
    "rotate_queries_or_keys", "xpos_scale", "lag_attend", "patchify",
    "ring_attend", "ring_attention_local",
]
