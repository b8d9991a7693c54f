"""RandAugment on device (reference: dataloaders/randaugment.py — 14
cv2-based ops + level->magnitude mapping, imported by the bird/msrvtt
loaders but never wired into an active transform; provided here as the same
aug surface, implemented as batched jitted jnp ops).

Per image, N ops are drawn from the op set and applied at magnitude M
(RandomAugment(N=2, M=10) semantics, randaugment.py:310-334). Because jit
needs static control flow, every op is computed and ``lax.switch`` selects —
at these image sizes (224^2) the op bodies are cheap elementwise/affine work
and XLA dead-code-shares the common subexpressions.

Geometric ops (rotate/shear/translate) run through one shared affine
bilinear sampler with zero fill, matching the cv2.warpAffine calls.
Histogram ops (autocontrast/equalize) use min-max stretch and a cumulative
histogram computed with one-hot matmuls (TPU-friendly; no scatter).

Inputs/outputs: float [N, H, W, 3] in [0, 1].
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from hmmc_tpu.ops.image_ops import (
    adjust_brightness, adjust_contrast, adjust_saturation)

MAX_LEVEL = 10


# ---------------------------------------------------------------------------
# shared affine sampler (cv2.warpAffine equivalent, zero fill)
# ---------------------------------------------------------------------------

def _affine_sample(img: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """img: [H, W, C]; mat: [2, 3] output->input coordinate map (like the
    inverse warp cv2 applies). Bilinear, zero fill."""
    h, w = img.shape[0], img.shape[1]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    sx = mat[0, 0] * gx + mat[0, 1] * gy + mat[0, 2]
    sy = mat[1, 0] * gx + mat[1, 1] * gy + mat[1, 2]
    valid = ((sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1))
    sx = jnp.clip(sx, 0.0, w - 1.0)
    sy = jnp.clip(sy, 0.0, h - 1.0)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]
    tl = img[y0, x0]
    tr = img[y0, x1]
    bl = img[y1, x0]
    br = img[y1, x1]
    out = ((tl * (1 - wx) + tr * wx) * (1 - wy)
           + (bl * (1 - wx) + br * wx) * wy)
    return out * valid[..., None]


def rotate(img: jnp.ndarray, degrees: jnp.ndarray) -> jnp.ndarray:
    h, w = img.shape[0], img.shape[1]
    theta = -degrees * jnp.pi / 180.0  # inverse map
    c, s = jnp.cos(theta), jnp.sin(theta)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    mat = jnp.array([[c, -s, cx - c * cx + s * cy],
                     [s, c, cy - s * cx - c * cy]])
    return _affine_sample(img, mat)


def shear_x(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    mat = jnp.array([[1.0, factor, 0.0], [0.0, 1.0, 0.0]])
    return _affine_sample(img, mat)


def shear_y(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    mat = jnp.array([[1.0, 0.0, 0.0], [factor, 1.0, 0.0]])
    return _affine_sample(img, mat)


def translate_x(img: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
    mat = jnp.array([[1.0, 0.0, offset], [0.0, 1.0, 0.0]])
    return _affine_sample(img, mat)


def translate_y(img: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
    mat = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, offset]])
    return _affine_sample(img, mat)


# ---------------------------------------------------------------------------
# intensity ops (single image [H, W, 3] in [0,1]; magnitude scalar)
# ---------------------------------------------------------------------------

def solarize(img: jnp.ndarray, thresh: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(img < thresh, img, 1.0 - img)


def posterize(img: jnp.ndarray, bits: jnp.ndarray) -> jnp.ndarray:
    levels = 2.0 ** bits
    x = jnp.floor(img * 255.0 / 256.0 * levels) / levels * 256.0 / 255.0
    return jnp.clip(x, 0.0, 1.0)


def autocontrast(img: jnp.ndarray) -> jnp.ndarray:
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / (hi - lo), 1.0)
    off = jnp.where(hi > lo, -lo * scale, 0.0)
    return jnp.clip(img * scale + off, 0.0, 1.0)


def equalize(img: jnp.ndarray) -> jnp.ndarray:
    """Per-channel histogram equalization via one-hot cumsum (no scatter)."""
    u8 = jnp.clip(img * 255.0, 0, 255).astype(jnp.int32)        # [H, W, 3]
    one_hot = jax.nn.one_hot(u8, 256, dtype=jnp.float32)         # [H,W,3,256]
    hist = jnp.sum(one_hot, axis=(0, 1))                         # [3, 256]
    cdf = jnp.cumsum(hist, axis=-1)
    total = cdf[:, -1:]
    cdf_min = jnp.min(jnp.where(hist > 0, cdf, jnp.inf), axis=-1,
                      keepdims=True)
    denom = jnp.maximum(total - cdf_min, 1.0)
    table = jnp.clip((cdf - cdf_min) / denom, 0.0, 1.0)          # [3, 256]
    out = jnp.take_along_axis(
        table[None, None], u8[..., None], axis=-1)[..., 0]
    return out


def sharpness(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    """Blend with a 3x3 smoothed version (PIL ImageEnhance.Sharpness
    semantics, randaugment.py:131-149)."""
    kernel = jnp.array([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]]) / 13.0
    pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    smooth = sum(
        kernel[dy, dx] * pad[dy:dy + img.shape[0], dx:dx + img.shape[1]]
        for dy in range(3) for dx in range(3))
    return jnp.clip(smooth + (img - smooth) * factor, 0.0, 1.0)


# ---------------------------------------------------------------------------
# the op table (names match randaugment.py's func_dict)
# ---------------------------------------------------------------------------

def _ops(img, mag, signed):
    """All ops at level->magnitude mapping of arg_dict
    (randaugment.py:288-309); `mag` in [0,1] = level/MAX_LEVEL, `signed`
    in {-1, 1}."""
    b = img
    return [
        b,                                               # Identity
        autocontrast(b),                                 # AutoContrast
        equalize(b),                                     # Equalize
        rotate(b, signed * mag * 30.0),                  # Rotate
        solarize(b, 1.0 - mag),                          # Solarize
        adjust_saturation(b[None], 1.0
                          + signed * mag * 0.9)[0],      # Color
        adjust_contrast(b[None], 1.0
                        + signed * mag * 0.9)[0],        # Contrast
        adjust_brightness(b[None], 1.0
                          + signed * mag * 0.9)[0],      # Brightness
        sharpness(b, 1.0 + signed * mag * 0.9),          # Sharpness
        shear_x(b, signed * mag * 0.3),                  # ShearX
        translate_x(b, signed * mag * 0.45
                    * b.shape[1]),                       # TranslateX
        translate_y(b, signed * mag * 0.45
                    * b.shape[0]),                       # TranslateY
        posterize(b, 8.0 - jnp.floor(mag * 4.0)),        # Posterize
        shear_y(b, signed * mag * 0.3),                  # ShearY
    ]


NUM_OPS = 14
OP_NAMES = ("Identity", "AutoContrast", "Equalize", "Rotate", "Solarize",
            "Color", "Contrast", "Brightness", "Sharpness", "ShearX",
            "TranslateX", "TranslateY", "Posterize", "ShearY")


def _apply_one(img, op_idx, mag, signed):
    branches = [lambda b, m, s, i=i: _ops(b, m, s)[i] for i in range(NUM_OPS)]
    return jax.lax.switch(op_idx, branches, img, mag, signed)


@functools.partial(jax.jit, static_argnames=("n_ops",))
def randaugment(rng: jax.Array, images: jnp.ndarray, n_ops: int = 2,
                magnitude: int = 10) -> jnp.ndarray:
    """images: float [N, H, W, 3] in [0,1]; applies `n_ops` random ops per
    image at level `magnitude` (RandomAugment(N, M), randaugment.py:310-334;
    the reference draws uniform ops and a random sign per op)."""
    n = images.shape[0]
    mag = jnp.float32(magnitude) / MAX_LEVEL

    def per_image(img, key):
        def body(i, carry):
            img, key = carry
            key, k_op, k_sign = jax.random.split(key, 3)
            op = jax.random.randint(k_op, (), 0, NUM_OPS)
            signed = jnp.where(jax.random.bernoulli(k_sign), 1.0, -1.0)
            return (_apply_one(img, op, mag, signed), key)

        out, _ = jax.lax.fori_loop(0, n_ops, body, (img, key))
        return out

    keys = jax.random.split(rng, n)
    return jax.vmap(per_image)(images, keys)
