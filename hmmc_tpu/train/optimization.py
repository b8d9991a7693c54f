"""BertAdam-equivalent optimizer (reference: modules/optimization.py and the
param grouping of main_task_retrieval.py:171-212).

Exact semantics reproduced:

- Adam WITHOUT bias correction: m = b1*m + (1-b1)*g; v = b2*v + (1-b2)*g^2;
  update = m/(sqrt(v)+eps) + wd*p; p -= lr_t * update
  (optimization.py:120-166).
- Per-parameter grad-norm clip to ``max_grad_norm`` inside the step
  (optimization.py:135-136) — each leaf clipped by its own norm. (The train
  loop's additional GLOBAL clip_grad_norm(1.0), main_task_retrieval.py:290,
  is chained in by the trainer.)
- Schedules on progress = step/t_total: ``warmup_cosine`` (whose cosine
  phase ignores the warmup offset — a reference quirk, optimization.py:26-29),
  ``warmup_constant``, ``warmup_linear``.
- Param grouping by name (main_task_retrieval.py:176-199):
  * params under ``visual_encoder/visual`` (the CLIP ViT): lr * coef_lr
  * params under ``text_encoder``: text_lr
  * everything else: lr
  * weight decay 0 for any leaf whose name contains ``bias`` and for
    HF-style LayerNorms (chinese tower + MLM-head ``transform_ln``) —
    NOTE the reference's ``no_decay`` match is the literal substring
    ``"LayerNorm.weight"``, which the CLIP towers' ``ln_*`` modules do NOT
    match, so CLIP LayerNorm scales DO decay; reproduced exactly.

Implemented as a single optax-style GradientTransformation so the whole
update is one fused XLA computation per step.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

# --------------------------------------------------------------------------
# schedules (multiplier in [0,1] over progress = step / t_total)
# --------------------------------------------------------------------------

def warmup_cosine(x, warmup=0.002):
    """optimization.py:26-29 — cosine phase ignores the warmup offset."""
    return jnp.where(x < warmup, x / warmup,
                     0.5 * (1.0 + jnp.cos(math.pi * x)))


def warmup_constant(x, warmup=0.002):
    return jnp.where(x < warmup, x / warmup, 1.0)


def warmup_linear(x, warmup=0.002):
    return jnp.where(x < warmup, x / warmup,
                     jnp.maximum((x - 1.0) / (warmup - 1.0), 0.0))


SCHEDULES = {
    "warmup_cosine": warmup_cosine,
    "warmup_constant": warmup_constant,
    "warmup_linear": warmup_linear,
}


# --------------------------------------------------------------------------
# param classification (reference group semantics on flax paths)
# --------------------------------------------------------------------------

_HF_LAYERNORM_MODULES = ("transform_ln", "attn_ln", "output_ln",
                         "embeddings_ln")


def _path_names(path) -> list:
    return [getattr(p, "key", getattr(p, "name", str(p))) for p in path]


def decay_mask(params) -> Any:
    """True where weight decay applies."""
    def classify(path, _):
        names = _path_names(path)
        leaf = names[-1]
        if "bias" in leaf:
            return False
        if leaf == "scale" and any(n in _HF_LAYERNORM_MODULES for n in names):
            return False
        return True

    return jax.tree_util.tree_map_with_path(classify, params)


def lr_tree(params, lr: float, text_lr: float, coef_lr: float) -> Any:
    """Per-leaf base learning rate (main_task_retrieval.py:192-199).

    ``t_projector`` gets lr 0: the reference builds it but never calls it in
    any forward, so its params never receive gradients (DDP
    find_unused_parameters=True) — de-facto frozen; an lr of 0 reproduces
    that exactly (BertAdam's decoupled wd is also scaled by lr)."""
    def classify(path, _):
        names = _path_names(path)
        joined = "/".join(names)
        if names and names[0] == "t_projector":
            return 0.0
        if "visual_encoder/visual" in joined:
            return lr * coef_lr
        if names and names[0].startswith("text_encoder"):
            return text_lr
        return lr

    return jax.tree_util.tree_map_with_path(classify, params)


# --------------------------------------------------------------------------
# the transformation
# --------------------------------------------------------------------------

class BertAdamState(NamedTuple):
    step: jnp.ndarray
    m: Any
    v: Any


def bert_adam(
    lr_leaves: Any,
    schedule: str = "warmup_cosine",
    warmup: float = -1.0,
    t_total: int = -1,
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-6,
    decay_leaves: Optional[Any] = None,
    weight_decay: float = 0.01,
    max_grad_norm: float = 1.0,
    state_dtype: Optional[Any] = None,
) -> optax.GradientTransformation:
    """lr_leaves: pytree of per-leaf base lr (see :func:`lr_tree`);
    decay_leaves: pytree of bool (see :func:`decay_mask`).

    ``state_dtype`` (opt-in, e.g. ``jnp.bfloat16``) stores the m/v moments in
    a reduced dtype to cut the optimizer's HBM traffic; the moment update and
    the parameter update always compute in fp32, only the carried state is
    down-cast. ``None`` (default) keeps exact reference semantics: state in
    the parameter dtype."""
    sched_fn: Callable = SCHEDULES[schedule]

    def _state_zeros(p):
        return jnp.zeros(p.shape, state_dtype or p.dtype)

    def init(params):
        return BertAdamState(
            step=jnp.zeros((), jnp.int32),
            m=jax.tree_util.tree_map(_state_zeros, params),
            v=jax.tree_util.tree_map(_state_zeros, params))

    def update(grads, state, params):
        if params is None:
            raise ValueError("bert_adam requires params")

        if max_grad_norm > 0:
            def clip(g):
                n = jnp.linalg.norm(g.astype(jnp.float32))
                scale = jnp.minimum(1.0, max_grad_norm / jnp.maximum(n, 1e-6))
                return g * scale.astype(g.dtype)

            grads = jax.tree_util.tree_map(clip, grads)

        def upd_m(mm, g):
            out = mm.astype(jnp.float32) * b1 + g.astype(jnp.float32) * (1 - b1)
            return out.astype(state_dtype) if state_dtype else out.astype(mm.dtype)

        def upd_v(vv, g):
            g32 = g.astype(jnp.float32)
            out = vv.astype(jnp.float32) * b2 + jnp.square(g32) * (1 - b2)
            return out.astype(state_dtype) if state_dtype else out.astype(vv.dtype)

        m = jax.tree_util.tree_map(upd_m, state.m, grads)
        v = jax.tree_util.tree_map(upd_v, state.v, grads)

        if t_total != -1:
            progress = state.step.astype(jnp.float32) / t_total
            mult = sched_fn(progress, warmup)
        else:
            mult = jnp.float32(1.0)

        def upd(mm, vv, p, lr_leaf, decay_leaf):
            u = mm.astype(jnp.float32) / (jnp.sqrt(vv.astype(jnp.float32)) + eps)
            wd = weight_decay * jnp.asarray(decay_leaf, u.dtype)
            u = u + wd * p
            return (-(lr_leaf * mult) * u).astype(p.dtype)

        if decay_leaves is None:
            dl = jax.tree_util.tree_map(lambda _: True, params)
        else:
            dl = decay_leaves
        updates = jax.tree_util.tree_map(upd, m, v, params, lr_leaves, dl)
        return updates, BertAdamState(step=state.step + 1, m=m, v=v)

    return optax.GradientTransformation(init, update)


def scheduled_lr(lr: float, step: int, t_total: int,
                 schedule: str = "warmup_cosine",
                 warmup: float = 0.002) -> float:
    """The scalar lr BertAdam applies at ``step`` — the reference exposes
    this as ``optimizer.get_lr()[0]`` and logs it to tensorboard every
    display step (optimization.py:86-97, main_task_retrieval.py:311)."""
    if t_total <= 0:
        return float(lr)
    mult = SCHEDULES[schedule](step / t_total, warmup)
    return float(lr * float(mult))


def build_optimizer(
    params: Any,
    lr: float,
    text_lr: float,
    coef_lr: float,
    weight_decay: float,
    warmup_proportion: float,
    t_total: int,
    schedule: str = "warmup_cosine",
    global_clip_norm: float = 1.0,
    state_dtype: Optional[Any] = None,
) -> optax.GradientTransformation:
    """The full reference chain: global clip_grad_norm(1.0)
    (main_task_retrieval.py:290) -> BertAdam(warmup_cosine, b2=.98, e=1e-6,
    per-param clip 1.0) with 6 param groups (prep_optimizer).

    ``state_dtype=jnp.bfloat16`` (CLI ``--optim_bf16_state``) halves the
    optimizer-state HBM traffic; see :func:`bert_adam`."""
    chain = [
        optax.clip_by_global_norm(global_clip_norm),
        bert_adam(
            lr_leaves=lr_tree(params, lr, text_lr, coef_lr),
            schedule=schedule,
            warmup=warmup_proportion,
            t_total=t_total,
            b1=0.9, b2=0.98, eps=1e-6,
            decay_leaves=decay_mask(params),
            weight_decay=weight_decay,
            max_grad_norm=1.0,
            state_dtype=state_dtype,
        ),
    ]
    return optax.chain(*chain)
