"""Device-side image preprocessing (jitted, batched).

The reference runs its whole transform stack per-frame on dataloader-worker
CPUs (PIL/torchvision/cv2: dataloader_bird.py:113-121,
dataloader_msrvtt_retrieval.py:242-247); that CPU loop is its data-path
bottleneck (SURVEY §2.9). Here the host only decodes JPEG to fixed-size
uint8; everything else — dtype cast, resize, crop, SimCLR augmentation,
normalization — runs on the TPU as one fused XLA program over the whole
[B, F, H, W, 3] batch.

Semantics per op follow the torchvision transforms the reference composes:

- eval / finetune (dataloader_msrvtt_retrieval.py:242-247):
  Resize(bicubic, short side) -> CenterCrop -> normalize(CLIP mean/std).
- pretrain (SimCLR-style, dataloader_bird.py:113-121):
  RandomResizedCrop(224, scale=(.2,1)) -> ColorJitter(.4,.4,.4,.1) p=.8 ->
  RandomGrayscale(p=.2) -> GaussianBlur(sigma U[.1,2]) p=.5 ->
  RandomHorizontalFlip -> normalize. Known deviations (documented):
  RandomResizedCrop uses one clamped draw instead of torchvision's
  10-try rejection loop; ColorJitter applies brightness/contrast/
  saturation/hue in fixed order instead of a random permutation.

NOTE the reference's pretrain normalize uses mean (0.48145466, 0.4578275,
0.4578275) — the blue channel repeats the green value instead of CLIP's
0.40821073 (dataloader_bird.py:120, a bug to reproduce-or-flag per SURVEY).
``BIRD_PRETRAIN_MEAN`` reproduces it; ``CLIP_MEAN`` is the correct one.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
BIRD_PRETRAIN_MEAN = (0.48145466, 0.4578275, 0.4578275)  # reference quirk


# ---------------------------------------------------------------------------
# deterministic ops
# ---------------------------------------------------------------------------

def to_float(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> float32 [0,1] (ToTensor)."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x.astype(jnp.float32)


def normalize(x: jnp.ndarray, mean=CLIP_MEAN, std=CLIP_STD) -> jnp.ndarray:
    """x: [..., H, W, 3] float in [0,1]."""
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return (x - mean) / std


def resize_bicubic(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Batched bicubic resize, [..., H, W, C] -> [..., height, width, C]."""
    shape = (*x.shape[:-3], height, width, x.shape[-1])
    return jax.image.resize(to_float(x), shape, method="bicubic")


def resize_short_side(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Resize so the short side == size (static input shape required)."""
    h, w = x.shape[-3], x.shape[-2]
    if h <= w:
        nh, nw = size, max(size, int(round(w * size / h)))
    else:
        nh, nw = max(size, int(round(h * size / w))), size
    return resize_bicubic(x, nh, nw)


def center_crop(x: jnp.ndarray, size: int) -> jnp.ndarray:
    h, w = x.shape[-3], x.shape[-2]
    top = (h - size) // 2
    left = (w - size) // 2
    return x[..., top:top + size, left:left + size, :]


def eval_preprocess(frames: jnp.ndarray, resolution: int = 224,
                    mean=CLIP_MEAN, std=CLIP_STD) -> jnp.ndarray:
    """Resize(short side)->CenterCrop->normalize. frames: uint8
    [..., H, W, 3]."""
    x = resize_short_side(frames, resolution)
    x = center_crop(x, resolution)
    return normalize(x, mean, std)


# ---------------------------------------------------------------------------
# bilinear crop-resample (backbone of RandomResizedCrop)
# ---------------------------------------------------------------------------

def _bilinear_crop_one(img: jnp.ndarray, box: jnp.ndarray,
                       out: int) -> jnp.ndarray:
    """img: [H, W, C] float; box: [y0, x0, h, w] in pixels (float).
    Samples an out x out grid over the box with bilinear interpolation."""
    h, w = img.shape[0], img.shape[1]
    y0, x0, bh, bw = box[0], box[1], box[2], box[3]
    ys = y0 + (jnp.arange(out, dtype=jnp.float32) + 0.5) * bh / out - 0.5
    xs = x0 + (jnp.arange(out, dtype=jnp.float32) + 0.5) * bw / out - 0.5
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y_lo = jnp.floor(ys).astype(jnp.int32)
    x_lo = jnp.floor(xs).astype(jnp.int32)
    y_hi = jnp.minimum(y_lo + 1, h - 1)
    x_hi = jnp.minimum(x_lo + 1, w - 1)
    wy = (ys - y_lo)[:, None, None]
    wx = (xs - x_lo)[None, :, None]
    tl = img[y_lo][:, x_lo]
    tr = img[y_lo][:, x_hi]
    bl = img[y_hi][:, x_lo]
    br = img[y_hi][:, x_hi]
    top = tl * (1 - wx) + tr * wx
    bot = bl * (1 - wx) + br * wx
    return top * (1 - wy) + bot * wy


def random_resized_crop(
    rng: jax.Array, frames: jnp.ndarray, out: int = 224,
    scale: Tuple[float, float] = (0.2, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
) -> jnp.ndarray:
    """frames: [N, H, W, C] float; independent box per image."""
    n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    r_area, r_ratio, r_y, r_x = jax.random.split(rng, 4)
    area = h * w * jax.random.uniform(
        r_area, (n,), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(
        r_ratio, (n,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_r)
    bw = jnp.clip(jnp.sqrt(area * aspect), 1.0, w)
    bh = jnp.clip(jnp.sqrt(area / aspect), 1.0, h)
    y0 = jax.random.uniform(r_y, (n,)) * (h - bh)
    x0 = jax.random.uniform(r_x, (n,)) * (w - bw)
    boxes = jnp.stack([y0, x0, bh, bw], axis=1)
    return jax.vmap(lambda im, b: _bilinear_crop_one(im, b, out))(
        to_float(frames), boxes)


# ---------------------------------------------------------------------------
# color ops
# ---------------------------------------------------------------------------

def _blend(a: jnp.ndarray, b: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(b + (a - b) * factor[..., None, None, None], 0.0, 1.0)


def adjust_brightness(x, factor):
    return _blend(x, jnp.zeros_like(x), factor)


def adjust_contrast(x, factor):
    gray = jnp.mean(rgb_to_grayscale(x), axis=(-3, -2, -1), keepdims=True)
    return _blend(x, jnp.broadcast_to(gray, x.shape), factor)


def adjust_saturation(x, factor):
    return _blend(x, jnp.broadcast_to(rgb_to_grayscale(x), x.shape), factor)


def rgb_to_grayscale(x: jnp.ndarray) -> jnp.ndarray:
    wts = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    g = jnp.sum(x * wts, axis=-1, keepdims=True)
    return g


def adjust_hue(x: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Hue rotation by delta (in turns, torchvision convention [-0.5, 0.5])
    via HSV round-trip. x: [N, H, W, 3] in [0,1]; delta: [N]."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    diff = mx - mn
    safe = jnp.where(diff == 0, 1.0, diff)
    hr = jnp.where(mx == r, ((g - b) / safe) % 6.0, 0.0)
    hg = jnp.where((mx == g) & (mx != r), (b - r) / safe + 2.0, 0.0)
    hb = jnp.where((mx == b) & (mx != r) & (mx != g), (r - g) / safe + 4.0,
                   0.0)
    hue = jnp.where(diff == 0, 0.0, (hr + hg + hb) / 6.0)
    sat = jnp.where(mx == 0, 0.0, diff / jnp.where(mx == 0, 1.0, mx))
    val = mx
    hue = (hue + delta[:, None, None]) % 1.0
    # hsv -> rgb
    i = jnp.floor(hue * 6.0)
    f = hue * 6.0 - i
    p = val * (1 - sat)
    q = val * (1 - f * sat)
    t = val * (1 - (1 - f) * sat)
    i = i.astype(jnp.int32) % 6
    r2 = jnp.choose(i, [val, q, p, p, t, val], mode="clip")
    g2 = jnp.choose(i, [t, val, val, q, p, p], mode="clip")
    b2 = jnp.choose(i, [p, p, t, val, val, q], mode="clip")
    return jnp.stack([r2, g2, b2], axis=-1)


def color_jitter(rng: jax.Array, x: jnp.ndarray, brightness=0.4,
                 contrast=0.4, saturation=0.4, hue=0.1) -> jnp.ndarray:
    """Independent factors per image; fixed op order (see module note)."""
    n = x.shape[0]
    rb, rc, rs, rh = jax.random.split(rng, 4)
    fb = jax.random.uniform(rb, (n,), minval=max(0, 1 - brightness),
                            maxval=1 + brightness)
    fc = jax.random.uniform(rc, (n,), minval=max(0, 1 - contrast),
                            maxval=1 + contrast)
    fs = jax.random.uniform(rs, (n,), minval=max(0, 1 - saturation),
                            maxval=1 + saturation)
    fh = jax.random.uniform(rh, (n,), minval=-hue, maxval=hue)
    x = adjust_brightness(x, fb)
    x = adjust_contrast(x, fc)
    x = adjust_saturation(x, fs)
    x = adjust_hue(x, fh)
    return x


def random_grayscale(rng: jax.Array, x: jnp.ndarray, p=0.2) -> jnp.ndarray:
    n = x.shape[0]
    take = jax.random.bernoulli(rng, p, (n,))
    gray = jnp.broadcast_to(rgb_to_grayscale(x), x.shape)
    return jnp.where(take[:, None, None, None], gray, x)


def gaussian_blur(rng: jax.Array, x: jnp.ndarray,
                  sigma_range=(0.1, 2.0), kernel_size: int = 9
                  ) -> jnp.ndarray:
    """Separable gaussian blur with a per-image random sigma (the MoCo-v2
    GaussianBlur the reference composes, dataloader_bird.py:118)."""
    n = x.shape[0]
    sigma = jax.random.uniform(rng, (n,), minval=sigma_range[0],
                               maxval=sigma_range[1])
    half = kernel_size // 2
    grid = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k = jnp.exp(-(grid[None, :] ** 2) / (2 * sigma[:, None] ** 2))
    k = k / jnp.sum(k, axis=1, keepdims=True)                    # [N, K]

    def blur_one(img, k1):
        # img [H, W, C]; horizontal then vertical depthwise conv
        pad = [(half, half), (0, 0), (0, 0)]
        v = jnp.pad(img, pad, mode="edge")
        v = jnp.moveaxis(v, 0, -1)                                # W,C,H+2p
        v = jax.vmap(jax.vmap(
            lambda row: jnp.convolve(row, k1, mode="valid")))(v)
        v = jnp.moveaxis(v, -1, 0)                                # H,W,C
        h_ = jnp.pad(v, [(0, 0), (half, half), (0, 0)], mode="edge")
        h_ = jnp.moveaxis(h_, 1, -1)                              # H,C,W+2p
        h_ = jax.vmap(jax.vmap(
            lambda row: jnp.convolve(row, k1, mode="valid")))(h_)
        return jnp.moveaxis(h_, -1, 1)

    return jax.vmap(blur_one)(x, k)


def random_apply(rng: jax.Array, fn, x: jnp.ndarray, p: float
                 ) -> jnp.ndarray:
    """Per-image coin flip between fn(x) and x."""
    n = x.shape[0]
    r_coin, r_fn = jax.random.split(rng)
    take = jax.random.bernoulli(r_coin, p, (n,))
    return jnp.where(take[:, None, None, None], fn(r_fn, x), x)


def random_hflip(rng: jax.Array, x: jnp.ndarray, p=0.5) -> jnp.ndarray:
    n = x.shape[0]
    take = jax.random.bernoulli(rng, p, (n,))
    return jnp.where(take[:, None, None, None], x[:, :, ::-1, :], x)


# ---------------------------------------------------------------------------
# compositions
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("out", "reproduce_mean_quirk"))
def simclr_augment(rng: jax.Array, frames: jnp.ndarray, out: int = 224,
                   reproduce_mean_quirk: bool = True) -> jnp.ndarray:
    """The pretrain transform stack (dataloader_bird.py:113-121) on device.
    frames: uint8 [N, H, W, 3] -> float32 normalized [N, out, out, 3]."""
    r = jax.random.split(rng, 5)
    x = random_resized_crop(r[0], frames, out=out, scale=(0.2, 1.0))
    x = random_apply(r[1], color_jitter, x, p=0.8)
    x = random_grayscale(r[2], x, p=0.2)
    x = random_apply(r[3], gaussian_blur, x, p=0.5)
    x = random_hflip(r[4], x, p=0.5)
    mean = BIRD_PRETRAIN_MEAN if reproduce_mean_quirk else CLIP_MEAN
    return normalize(x, mean, CLIP_STD)


@functools.partial(jax.jit, static_argnames=("resolution",))
def finetune_preprocess(frames: jnp.ndarray, resolution: int = 224
                        ) -> jnp.ndarray:
    """Deterministic eval/finetune path for a [B, F, H, W, 3] uint8 batch."""
    b, f = frames.shape[0], frames.shape[1]
    x = frames.reshape(b * f, *frames.shape[2:])
    x = eval_preprocess(x, resolution)
    return x.reshape(b, f, resolution, resolution, 3)
