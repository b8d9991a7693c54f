"""Symmetric per-row int8 quantization for retrieval feature banks.

Serving-scale extension of the extract/retrieve/serve path (no reference
equivalent — the reference ships no serving surface at all). The video
side of a retrieval index is static after ``--do_extract``; quantizing it
to int8 with per-row absmax scales

- shrinks the bank 4x vs fp32 (storage AND resident HBM at serving time),
- lets the ranking matmul run the MXU's s8 x s8 -> s32 mode, which on
  TPU doubles the dense rate vs bf16 and quarters the HBM traffic of the
  bandwidth-bound big-bank case (millions of videos x embed_dim).

The quantized features are L2-normalized CLIP embeddings (every
similarity in this framework normalizes first — modeling.py:207-229), so
per-row absmax scales lose < 0.5% per element and measured retrieval
metrics are unchanged at eval scale (tests/test_quant.py).

Layout contract for a quantized bank (features.npz):
  video        int8 [V, H]      + video_scale  f32 [V]
  frames       int8 [V, F, H]   + frame_scale  f32 [V, F]
  title        int8 [V, H]      + title_scale  f32 [V]   (retrieval_VT)
  quant        "int8"
Queries stay float: they are computed live at query time and are the
small side of every matmul.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

QUANT_KEY = "quant"
_EPS = 1e-12


# ---------------------------------------------------------------- host side

def quantize_rows_np(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric absmax int8 quantization along the LAST axis.

    Returns ``(q, scale)`` with ``x ~= q * scale[..., None]``; ``scale``
    has ``x``'s shape minus the last axis.
    """
    x = np.asarray(x, np.float32)
    absmax = np.maximum(np.abs(x).max(axis=-1), _EPS)
    scale = (absmax / 127.0).astype(np.float32)
    q = np.clip(np.rint(x / scale[..., None]), -127, 127).astype(np.int8)
    return q, scale


def dequantize_np(q: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """Inverse of :func:`quantize_rows_np` (fp32)."""
    return q.astype(np.float32) * np.asarray(scale, np.float32)[..., None]


def quantize_bank(payload: dict) -> dict:
    """Quantize the video-side arrays of a ``--do_extract`` payload in
    place-compatible form (returns a new dict; float keys are replaced by
    int8 + per-row scales, see module docstring for the layout)."""
    out = dict(payload)
    if "video" in out:
        out["video"], out["video_scale"] = quantize_rows_np(out["video"])
    if "frames" in out:
        out["frames"], out["frame_scale"] = quantize_rows_np(out["frames"])
    if "title" in out:
        out["title"], out["title_scale"] = quantize_rows_np(out["title"])
    out[QUANT_KEY] = np.str_("int8")
    return out


def dequantize_bank(bank: dict) -> dict:
    """Returns a float view of a (possibly) quantized bank: int8 arrays
    are expanded to fp32 and the scale/marker keys dropped. Float banks
    pass through unchanged."""
    if str(bank.get(QUANT_KEY, "")) != "int8":
        return dict(bank)
    out = {k: v for k, v in bank.items()
           if k not in (QUANT_KEY, "video_scale", "frame_scale",
                        "title_scale")}
    if "video" in out:
        out["video"] = dequantize_np(bank["video"], bank["video_scale"])
    if "frames" in out:
        out["frames"] = dequantize_np(bank["frames"], bank["frame_scale"])
    if "title" in out:
        out["title"] = dequantize_np(bank["title"], bank["title_scale"])
    return out


# -------------------------------------------------------------- device side

def quantize_rows(x):
    """jnp twin of :func:`quantize_rows_np` (for quantizing on-device
    without a host round-trip)."""
    import jax.numpy as jnp

    x = x.astype(jnp.float32)
    absmax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1), _EPS)
    scale = absmax / 127.0
    q = jnp.clip(jnp.round(x / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def int8_rank(q, bank_q, bank_scale):
    """Ranking logits against an int8 bank: fp queries x int8 bank.

    ``q`` [Q, H] float (any float dtype), ``bank_q`` int8 [V, H],
    ``bank_scale`` f32 [V]. The query side is quantized on the fly (it is
    tiny), the dot runs s8 x s8 -> s32 on the MXU, and the two scale
    vectors rescale the integer logits back to float:

        sim[i, j] ~= (q_i / |q_i scale|) . (bank_j / |bank scale_j|)
                     * qscale_i * bank_scale_j

    Returns f32 [Q, V]. Accuracy: normalized-embedding logits agree with
    the fp32 matmul to ~1e-2 absolute at unit scale (two absmax-127
    roundings), which leaves retrieval rankings unchanged in practice —
    verified in tests/test_quant.py including top-1 agreement.
    """
    import jax.lax as lax
    import jax.numpy as jnp

    qq, qs = quantize_rows(q)
    acc = lax.dot_general(
        qq, bank_q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32)
            * qs[:, None] * bank_scale[None, :].astype(jnp.float32))


def int8_frame_rank(q, frames_q, frame_scale):
    """Per-frame ranking logits: fp queries [Q, H] x int8 frames
    [V, F, H] (+ scales [V, F]) -> f32 [Q, V, F]."""
    import jax.lax as lax
    import jax.numpy as jnp

    qq, qs = quantize_rows(q)
    v, f, h = frames_q.shape
    acc = lax.dot_general(
        qq, frames_q.reshape(v * f, h),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32).reshape(q.shape[0], v, f)
    return (acc.astype(jnp.float32) * qs[:, None, None]
            * frame_scale[None, :, :].astype(jnp.float32))
