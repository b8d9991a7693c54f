"""Fused attention kernel (Pallas/TPU).

Shape regime (SURVEY §5): sequences here are SHORT — 32-77 text tokens,
50-197 ViT patches, 12-48 frames — while the batch*heads axis is large
(B*12 frames*12 heads). The right kernel for that regime is not a
KV-blocked flash loop (nothing to tile at L<=256) but a single fused block
per (batch, head): QK^T, fp32 softmax, and PV in one VMEM-resident program,
eliminating the HBM round-trips of the unfused chain. Blocks use the TRUE
[l, d] shape — Mosaic masks unaligned tail tiles internally; round 4
removed the original explicit pad-to-128 HBM copies, which cost both
bytes (3-7 padded [B*H, Lp, 128] arrays per call) and time (per-call
2.96->2.53 ms at L=50, 5.44->3.71 at L=197, 2.05->1.88 at L=577 measured
on the v5e after unpadding).

Causal masking (the CLIP text tower, module_clip.py:441-447) is computed
in-kernel from iota; arbitrary additive masks fall back to XLA attention
(hmmc_tpu.ops.attention).

Backward (round 4): a fused flash-style kernel that recomputes the fp32
probabilities per (batch, head) block in VMEM and emits dq/dk/dv — no
[L, L] tensor ever reaches HBM. (The previous backward ran jax.vjp
through the jnp reference, whose recompute materializes fp32
[B*H, L, L] logits+probs as HBM temps.)

Selection is geometry-aware by default (TaskConfig.use_pallas_attention
= "auto", config.resolve_use_pallas): XLA below the measured crossover
— at the flagship L=50 geometry XLA's batched GEMM lowering wins
in-model — and this kernel at/above it (ViT-L/14@336px, +27-33%);
"on"/"off" force a path (in-model numbers: docs/design.md).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, true_len: int,
                      causal: bool, scale: float):
    q = q_ref[0].astype(jnp.float32)            # [Lp, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale     # [Lp, Lp]
    lp = logits.shape[0]
    # blocks carry the TRUE length since round 4, so the padded-key mask
    # (cols < true_len) only materializes when a caller ever pads again;
    # the common paths build either no mask (ViT/temporal) or causal-only
    mask = None
    if lp > true_len:
        cols = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 1)
        mask = cols < true_len                   # kill padded keys
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 1)
        cm = cols <= rows
        mask = cm if mask is None else jnp.logical_and(mask, cm)
    if mask is not None:
        logits = jnp.where(mask, logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    w = jnp.exp(logits - m)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        w.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   causal: bool) -> jnp.ndarray:
    """No explicit HBM padding (round 4): block shape [1, l, d] reads
    the arrays as-is and Mosaic masks unaligned tail tiles internally.
    The original version padded L and D up to 128 in HBM, which (a)
    materialized three [B*H, Lp, 128]-padded copies per call — 2.6x the
    bytes at (197, 64) — and (b) was measurably SLOWER in the kernel
    itself (per-call 2.96->2.53 ms at L=50, 5.44->3.71 at L=197,
    2.05->1.88 at L=577 on the v5e). true_len masking is kept for the
    kernel's internal tail handling semantics (cols beyond l never
    exist in the block, so it is now inert for non-causal)."""
    b, h, l, d = q.shape
    scale = d ** -0.5

    def prep(t):
        return t.reshape(b * h, l, d)

    qp, kp, vp = prep(q), prep(k), prep(v)
    kernel = functools.partial(
        _attention_kernel, true_len=l, causal=causal, scale=scale)
    spec = pl.BlockSpec((1, l, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b * h, l, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * l * l * d,
            bytes_accessed=4 * b * h * l * d * q.dtype.itemsize,
            transcendentals=b * h * l * l),
    )(qp, kp, vp)
    return out.reshape(b, h, l, d)


def _attention_reference(q, k, v, causal: bool):
    """jnp reference (parity tests; also the pre-r4 backward)."""
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    if causal:
        l = q.shape[2]
        rows = jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
        logits = jnp.where((cols <= rows)[None, None], logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def _attention_bwd_kernel(q_ref, k_ref, v_ref, g_ref,
                          dq_ref, dk_ref, dv_ref, *, true_len: int,
                          causal: bool, scale: float):
    """Fused backward for one (batch, head) block: recompute the fp32
    probabilities IN VMEM and emit dq/dk/dv — no [L, L] tensor ever
    touches HBM (the pre-r4 backward ran jax.vjp through the jnp
    reference, whose recompute materializes fp32 [B*H, L, L] logits and
    probabilities as HBM temps — at ViT-L/14@336 geometry that is
    ~550 MB per layer of backward peak, part of the proven b2 OOM)."""
    q = q_ref[0].astype(jnp.float32)             # [Lp, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale       # [Lp, Lp]
    lp = logits.shape[0]
    mask = None
    if lp > true_len:                            # see _attention_kernel
        cols = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 1)
        mask = cols < true_len
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 1)
        cm = cols <= rows
        mask = cm if mask is None else jnp.logical_and(mask, cm)
    if mask is not None:
        logits = jnp.where(mask, logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    w = jnp.exp(logits - m)
    p = w / jnp.sum(w, axis=-1, keepdims=True)            # [Lp, Lp]
    # dV = P^T g      (padded g rows are zero -> no spurious terms)
    dv = jax.lax.dot_general(p, g, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # dP = g V^T ; softmax vjp: dS = P * (dP - sum(dP * P, axis=-1))
    dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = ds * scale
    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_backward(q, k, v, g, causal: bool):
    """No explicit HBM padding (same rationale as the forward):
    explicit jnp.pad here materialized SEVEN [B*H, Lp, 128]-padded HBM
    arrays per layer call (2x the bytes at Dh=64), which pushed the b8
    B/16x30 stretch point from fitting (19.95 clips/s with the old
    XLA-vjp backward) to a proven 16.15G-of-15.75G OOM. Unpadded
    blocks read/write the arrays as-is."""
    b, h, l, d = q.shape
    scale = d ** -0.5

    def prep(t):
        return t.reshape(b * h, l, d)

    qp, kp, vp, gp = prep(q), prep(k), prep(v), prep(g)
    kernel = functools.partial(
        _attention_bwd_kernel, true_len=l, causal=causal, scale=scale)
    spec = pl.BlockSpec((1, l, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((b * h, l, d), q.dtype)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * l * l * d,
            bytes_accessed=7 * b * h * l * d * q.dtype.itemsize,
            transcendentals=b * h * l * l),
    )(qp, kp, vp, gp)

    def unprep(t):
        return t.reshape(b, h, l, d)

    return unprep(dq), unprep(dk), unprep(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    causal: bool = False) -> jnp.ndarray:
    """q, k, v: [B, H, L, D] -> [B, H, L, D]."""
    return _flash_forward(q, k, v, causal)


def _fwd(q, k, v, causal):
    return _flash_forward(q, k, v, causal), (q, k, v)


def _bwd(causal, res, g):
    q, k, v = res
    return _flash_backward(q, k, v, g, causal)


fused_attention.defvjp(_fwd, _bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None,
                    causal: bool = False) -> jnp.ndarray:
    """Entry used by hmmc_tpu.ops.attention. Arbitrary additive masks fall
    back to the XLA path; mask=None (ViT, temporal transformer) and
    causal=True (CLIP text) take the fused kernel."""
    if mask is not None:
        from hmmc_tpu.ops.attention import dot_product_attention

        return dot_product_attention(q, k, v, mask)
    return fused_attention(q, k, v, causal)
