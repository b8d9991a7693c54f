"""Contrastive / retrieval losses (pure jnp functions).

Behavior parity with the reference:

- :func:`cross_en` — symmetric InfoNCE over a sim matrix with diagonal
  positives (until_module.py:196-205).
- :func:`dual_cross_en` — dual-softmax-reweighted variant
  (until_module.py:39-49, 207-217).
- :func:`milnce` (until_module.py:219-247), :func:`max_margin_ranking`
  (until_module.py:249-277) — parity-completeness losses.
- :func:`moco_contrastive` — InfoNCE of queries against momentum keys plus a
  negative queue (modeling.py:286-313): positives are rowwise q·k, negatives
  q·queue, temperature-scaled cross-entropy with target index 0.
- :func:`frame_self_loss` (FAM, modeling.py:315-323) and
  :func:`frame_cross_loss` (FTM, modeling.py:325-332) — the reference loops
  over the frame axis in Python; here the frame axis is a batched leading
  axis of ONE fused matmul against the queue (vmap), which keeps the MXU fed
  with a single [F*B, 1+K] logit computation instead of F small ones.

All math in fp32; inputs may be bf16 (cast up on entry).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _l2norm(x: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return x / n


def cross_en(sim_matrix: jnp.ndarray) -> jnp.ndarray:
    """-mean(diag(log_softmax(sim, axis=-1))). Rows = queries."""
    logpt = jax.nn.log_softmax(sim_matrix.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.diagonal(logpt))


def get_dual_matrix(sim_matrix: jnp.ndarray) -> jnp.ndarray:
    """sim * softmax(sim, axis=0) * softmax(sim, axis=1)
    (until_module.py:39-49; temp fixed to 1 as in the reference)."""
    s = sim_matrix.astype(jnp.float32)
    alpha = jax.nn.softmax(s, axis=0)
    beta = jax.nn.softmax(s, axis=1)
    return s * alpha * beta


def dual_cross_en(sim_matrix: jnp.ndarray) -> jnp.ndarray:
    return cross_en(get_dual_matrix(sim_matrix))


def milnce(sim_matrix: jnp.ndarray, batch_size: int, n_pair: int
           ) -> jnp.ndarray:
    """MIL-NCE over an (batch*n_pair) square sim matrix
    (until_module.py:219-247)."""
    s = sim_matrix.astype(jnp.float32)
    eye = jnp.eye(batch_size)
    mm_mask = jnp.kron(eye, jnp.ones((n_pair, n_pair)))
    from_text = s + mm_mask * -1e12
    from_video = s.T
    new_sim = jnp.concatenate([from_video, from_text], axis=-1)
    logpt = jax.nn.log_softmax(new_sim, axis=-1)
    mask_logpt = jnp.concatenate([mm_mask, jnp.zeros_like(mm_mask)], axis=-1)
    masked = logpt + (1.0 - mask_logpt) * -1e12
    new_logpt = -jax.nn.logsumexp(masked, axis=-1)
    mark = jnp.arange(batch_size) * n_pair + n_pair // 2
    return jnp.mean(new_logpt[mark])


def max_margin_ranking(
    sim_matrix: jnp.ndarray,
    margin: float = 1.0,
    negative_weighting: bool = False,
    batch_size: int = 1,
    n_pair: int = 1,
    hard_negative_rate: float = 0.5,
) -> jnp.ndarray:
    """Max-margin ranking loss (until_module.py:249-277)."""
    x = sim_matrix.astype(jnp.float32)
    d = jnp.diagonal(x)
    mm = (jax.nn.relu(margin + x - d[:, None])
          + jax.nn.relu(margin + x - d[None, :]))
    if negative_weighting and n_pair > 1 and batch_size > 1:
        easy = 1.0 - hard_negative_rate
        alpha = easy / ((batch_size - 1) * (1 - easy))
        mask = (1 - alpha) * jnp.eye(batch_size) + alpha
        mask = jnp.kron(mask, jnp.ones((n_pair, n_pair)))
        mm = mm * (mask * (batch_size * (1 - easy)))
    return jnp.mean(mm)


def moco_contrastive(
    q: jnp.ndarray,
    k: jnp.ndarray,
    queue: jnp.ndarray,
    temperature: float,
) -> jnp.ndarray:
    """InfoNCE vs a negative queue (modeling.py:286-313).

    q, k: [..., B, H] (leading axes are vmapped); queue: [H, K] (stored
    column-normalized). k and the queue are treated as constants
    (stop_gradient), matching the reference's no-grad key path.
    """
    q = _l2norm(q.astype(jnp.float32))
    k = jax.lax.stop_gradient(_l2norm(k.astype(jnp.float32)))
    queue = jax.lax.stop_gradient(queue.astype(jnp.float32))
    l_pos = jnp.sum(q * k, axis=-1, keepdims=True)            # [..., B, 1]
    l_neg = jnp.einsum("...bh,hk->...bk", q, queue)           # [..., B, K]
    logits = jnp.concatenate([l_pos, l_neg], axis=-1) / temperature
    # cross entropy with target 0 == l_pos/T - logsumexp(logits)
    logpt = logits[..., 0] - jax.nn.logsumexp(logits, axis=-1)
    return -jnp.mean(logpt)


def frame_self_loss(
    frame_pred: jnp.ndarray,
    frame_proj_k: jnp.ndarray,
    queue_frame: jnp.ndarray,
    temperature: float,
) -> jnp.ndarray:
    """FAM: adjacent-frame alignment (modeling.py:315-323).

    frame_pred, frame_proj_k: [B, F, H]. For each i in [0, F-2]:
    contrastive(pred[:,i], proj_k[:,i+1]) + contrastive(pred[:,i+1],
    proj_k[:,i]), averaged over F-1. Batched into one vmapped call of
    2*(F-1) pair terms.
    """
    f = frame_pred.shape[1]
    q = jnp.concatenate(
        [frame_pred[:, :-1], frame_pred[:, 1:]], axis=1)      # [B, 2(F-1), H]
    k = jnp.concatenate(
        [frame_proj_k[:, 1:], frame_proj_k[:, :-1]], axis=1)
    per_pair = jax.vmap(
        lambda qi, ki: moco_contrastive(qi, ki, queue_frame, temperature),
        in_axes=(1, 1))(q, k)                                  # [2(F-1)]
    # reference sums the two directions then averages over (F-1)
    return jnp.sum(per_pair) / (f - 1)


def frame_cross_loss(
    frame_fea: jnp.ndarray,
    frame_fea_k: jnp.ndarray,
    queue_frame: jnp.ndarray,
    text_fea: jnp.ndarray,
    text_fea_k: jnp.ndarray,
    queue_text: jnp.ndarray,
    temperature: float,
) -> jnp.ndarray:
    """FTM: per-frame text<->frame contrast (modeling.py:325-332).

    For each frame i: contrastive(text, frame_k[:,i], queue_frame) +
    contrastive(frame[:,i], text_k, queue_text), averaged over F.
    """
    f = frame_fea.shape[1]
    t2f = jax.vmap(
        lambda ki: moco_contrastive(text_fea, ki, queue_frame, temperature),
        in_axes=1)(frame_fea_k)                                # [F]
    f2t = jax.vmap(
        lambda qi: moco_contrastive(qi, text_fea_k, queue_text, temperature),
        in_axes=1)(frame_fea)                                  # [F]
    return (jnp.sum(t2f) + jnp.sum(f2t)) / f


def loose_similarity(
    sequence_output: jnp.ndarray,
    visual_output: jnp.ndarray,
    logit_scale: jnp.ndarray,
) -> jnp.ndarray:
    """Scaled cosine-similarity logits (modeling.py:207-229).

    sequence_output: [Bq, H]; visual_output: [Bv, H] -> [Bq, Bv], or
    [Bv, F, H] -> [Bq, Bv, F] (the reference's 3-D branch:
    matmul -> [Bv, Bq, F] -> permute(1,0,2), modeling.py:224-227).
    logit_scale: scalar, already exp-ed and clamped by the caller.
    """
    v = _l2norm(visual_output.astype(jnp.float32))
    s = _l2norm(sequence_output.astype(jnp.float32))
    if v.ndim == 2:
        return logit_scale * jnp.matmul(s, v.T)
    # [Bv, F, H] x [Bq, H] -> [Bq, Bv, F]
    logits = logit_scale * jnp.einsum("vfh,qh->qvf", v, s)
    return logits


def finetune_retrieval_loss(
    query_output: jnp.ndarray,
    visual_output: jnp.ndarray,
    frame_output: Optional[jnp.ndarray],
    logit_scale: jnp.ndarray,
    weight_vtm: float,
    weight_ftm: float,
) -> dict:
    """BirdModel.forward training loss (modeling.py:682-722): symmetric
    CrossEn on the global sim matrix (VTM) plus the per-frame mean CrossEn
    (FTM, modeling.py:665-680). Inputs are the GLOBAL batch features (under
    pjit the gathered matmul is a sharded einsum; no explicit collective)."""
    sim = loose_similarity(query_output, visual_output, logit_scale)
    sim_loss = cross_en(sim) + cross_en(sim.T)
    loss = weight_vtm * sim_loss
    frame_loss = jnp.float32(0.0)
    if frame_output is not None:
        # per-frame sim: [F] losses, each symmetric CrossEn, meaned
        def per_frame(frame_i):
            m = loose_similarity(query_output, frame_i, logit_scale)
            return cross_en(m) + cross_en(m.T)

        per = jax.vmap(per_frame, in_axes=1)(frame_output)     # [F]
        frame_loss = jnp.mean(per)
        loss = loss + weight_ftm * frame_loss
    return {"loss": loss, "sim_loss": sim_loss, "frame_loss": frame_loss}
