"""Jitted train steps + train state (reference: train_epoch of
main_task_retrieval.py:250-318 and BirdPreTrainedModel.forward,
modeling.py:334-436).

Everything that happens per step — query/key forwards, momentum EMA, the
global-batch contrastive losses, queue enqueue, grad clip, BertAdam update —
is ONE jitted computation over globally-sharded arrays. The batch axis is
sharded over the mesh's ``data`` axis; parameters, optimizer state, and the
MoCo queues are replicated. The B_global x B_global similarity matrices are
sharded einsums (XLA inserts the all-gather over ICI), which subsumes the
reference's explicit ``dist_collect`` calls (modeling.py:698-700, 249-259).

Gradient accumulation (``--gradient_accumulation_steps``,
main_task_retrieval.py:278-302) is a ``lax.scan`` over micro-batches inside
the same jit.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from hmmc_tpu import losses
from hmmc_tpu.config import CrossConfig, TaskConfig
from hmmc_tpu.models.pretrain import (
    BirdPretrainModel, MoCoQueues, init_key_params, mask_tokens, mlm_loss,
    momentum_update)
from hmmc_tpu.models.retrieval import BirdModel


# ---------------------------------------------------------------------------
# states
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class FinetuneState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    # ResNet towers only: BatchNorm running stats (empty for the ViTs —
    # torch keeps these inside its BN modules; functionally they are
    # train-step state exactly like the optimizer moments)
    batch_stats: Any = None

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation,
               batch_stats: Any = None):
        return cls(params=params, opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32),
                   batch_stats={} if batch_stats is None else batch_stats)


@flax.struct.dataclass
class PretrainState:
    params: Any
    params_k: Any            # momentum twins of MOMENTUM_SUBTREES
    batch_stats: Any         # projector/predictor BN stats (query side)
    batch_stats_k: Any       # key-side projector BN stats
    opt_state: Any
    queues: MoCoQueues
    step: jnp.ndarray

    @classmethod
    def create(cls, variables: Dict, tx: optax.GradientTransformation,
               queues: MoCoQueues):
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        return cls(
            params=params,
            params_k=init_key_params(params),
            batch_stats=stats,
            # Key-side BN stats for BOTH projectors: t_projector_k never
            # forwards (reference modeling.py:356-376 only invokes the v
            # side) so its stats stay at init — tracked anyway so a
            # reference checkpoint round-trip preserves them faithfully.
            batch_stats_k=jax.tree_util.tree_map(
                jnp.copy, {k: stats[k]
                           for k in ("t_projector", "v_projector")
                           if k in stats}),
            opt_state=tx.init(params),
            queues=queues,
            step=jnp.zeros((), jnp.int32))


def _split_microbatches(batch: Dict[str, jnp.ndarray], n: int) -> Dict:
    return {k: v.reshape(n, v.shape[0] // n, *v.shape[1:])
            for k, v in batch.items()}


def _accumulate(loss_fn: Callable, params, batch: Dict, n_accum: int,
                rng: Optional[jax.Array] = None) -> Tuple[Any, Dict]:
    """Mean-of-grads over micro-batches via lax.scan (reference divides the
    loss by accumulation steps, main_task_retrieval.py:278-280)."""
    if n_accum == 1:
        rngs = (rng,) if rng is not None else ()
        return jax.grad(loss_fn, has_aux=True)(params, batch, *rngs)

    micro = _split_microbatches(batch, n_accum)

    def body(carry, xs):
        if rng is not None:
            mb, r = xs
            grads, aux = jax.grad(loss_fn, has_aux=True)(params, mb, r)
        else:
            grads, aux = jax.grad(loss_fn, has_aux=True)(params, xs)
        acc = jax.tree_util.tree_map(jnp.add, carry, grads)
        return acc, aux

    zero = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
    xs = (micro, jax.random.split(rng, n_accum)) if rng is not None else micro
    grads, auxes = jax.lax.scan(body, zero, xs)
    grads = jax.tree_util.tree_map(lambda g: g / n_accum, grads)
    # Mean over micro-batches so logged metrics describe the same global
    # batch the accumulated gradient does (not just the last micro).
    aux = jax.tree_util.tree_map(lambda a: a.mean(0), auxes)
    return grads, aux


def _constrain_opt(opt_state, opt_shardings):
    """ZeRO-1: pin the updated optimizer state to its data-axis sharding
    (parallel/mesh.zero_opt_shardings) so it stays sharded across donated
    steps instead of being replicated by XLA's propagation."""
    if opt_shardings is None:
        return opt_state
    return jax.lax.with_sharding_constraint(opt_state, opt_shardings)


# ---------------------------------------------------------------------------
# fine-tune step (BirdModel)
# ---------------------------------------------------------------------------

def make_finetune_step(
    model: BirdModel,
    tx: optax.GradientTransformation,
    cross_config: CrossConfig,
    use_frame_fea: bool = True,
    n_accum: int = 1,
    use_frame_mask: bool = False,
    opt_shardings: Any = None,
) -> Callable:
    """Returns jitted (state, batch) -> (state, metrics). batch keys:
    query_ids [B,L] int32, query_mask [B,L], video [B,F,H,W,3] float,
    optional nframes [B] (used when use_frame_mask — the flag-controlled
    fix of the reference's all-ones temporal mask quirk)."""

    w_vtm = cross_config.weight_VTM_finetune
    w_ftm = cross_config.weight_FTM_finetune
    has_bn = bool(getattr(model.arch, "is_resnet", False))

    def _fmask(batch):
        if use_frame_mask and "nframes" in batch:
            n_f = batch["video"].shape[1]
            return (jnp.arange(n_f)[None, :]
                    < batch["nframes"][:, None]).astype(jnp.int32)
        return None

    def _compose(params, q, v, f):
        scale = jnp.minimum(
            jnp.exp(jax.lax.stop_gradient(
                params["text_encoder"]["logit_scale"])), 100.0)
        return losses.finetune_retrieval_loss(
            q, v, f if use_frame_fea else None, scale, w_vtm, w_ftm)

    if not has_bn:
        def loss_fn(params, batch):
            var = {"params": params}
            q = model.apply(var, batch["query_ids"], batch["query_mask"],
                            method="encode_text")
            v, f = model.apply(var, batch["video"], _fmask(batch),
                               method="encode_video")
            out = _compose(params, q, v, f)
            return out["loss"], out

        def step(state: FinetuneState, batch: Dict
                 ) -> Tuple[FinetuneState, Dict]:
            grads, aux = _accumulate(loss_fn, state.params, batch, n_accum)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            opt_state = _constrain_opt(opt_state, opt_shardings)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=params, opt_state=opt_state, step=state.step + 1)
            metrics = {k: v for k, v in aux.items()}
            metrics["grad_norm"] = optax.global_norm(grads)
            return new_state, metrics

        return jax.jit(step, donate_argnums=0)

    # --- ResNet towers: BatchNorm batch stats are per-step state (torch
    # updates them inside the module; here they ride FinetuneState and
    # evolve across micro-batches like the MoCo queues do in pretrain) ---
    def loss_fn_bn(params, bstats, batch):
        var = {"params": params, "batch_stats": bstats}
        q = model.apply(var, batch["query_ids"], batch["query_mask"],
                        method="encode_text")
        (v, f), mut = model.apply(
            var, batch["video"], _fmask(batch), True,
            method="encode_video", mutable=["batch_stats"])
        out = _compose(params, q, v, f)
        return out["loss"], (out, mut["batch_stats"])

    def step_bn(state: FinetuneState, batch: Dict
                ) -> Tuple[FinetuneState, Dict]:
        if n_accum == 1:
            grads, (aux, bstats) = jax.grad(loss_fn_bn, has_aux=True)(
                state.params, state.batch_stats, batch)
        else:
            micro = _split_microbatches(batch, n_accum)
            zero = jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, dtype=jnp.float32),
                state.params)

            def body(carry, mb):
                bs, gacc = carry
                grads, (aux, bs) = jax.grad(loss_fn_bn, has_aux=True)(
                    state.params, bs, mb)
                gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
                return (bs, gacc), aux

            (bstats, grads), auxes = jax.lax.scan(
                body, (state.batch_stats, zero), micro)
            grads = jax.tree_util.tree_map(lambda g: g / n_accum, grads)
            aux = jax.tree_util.tree_map(lambda a: a.mean(0), auxes)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        opt_state = _constrain_opt(opt_state, opt_shardings)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, batch_stats=bstats,
            step=state.step + 1)
        metrics = {k: v for k, v in aux.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(step_bn, donate_argnums=0)


def make_finetune_vt_step(
    model,
    tx: optax.GradientTransformation,
    cross_config: CrossConfig,
    n_accum: int = 1,
    opt_shardings: Any = None,
) -> Callable:
    """retrieval_VT training step (BirdModel_VT.forward,
    modeling.py:744-785): the video branch is commented out in the
    reference; the active loss is weight_title * symmetric CrossEn on the
    query-vs-title sim matrix. The reference reads the undefined
    ``self.weight_title`` there — here it comes from CrossConfig.

    batch keys: query_ids/query_mask, title_ids/title_mask, video."""
    w_title = cross_config.weight_title
    has_bn = bool(getattr(model.arch, "is_resnet", False))

    def loss_fn(params, batch, bstats=None):
        var = {"params": params}
        if has_bn:
            var["batch_stats"] = bstats
        q = model.apply(var, batch["query_ids"], batch["query_mask"],
                        method="encode_text")
        t = model.apply(var, batch["title_ids"], batch["title_mask"],
                        method="encode_text")
        # the video tower still runs (its params stay trained/aligned with
        # checkpoints even though the active loss is text-text); ResNet
        # BN stays frozen — the video output never enters the VT loss
        v, _f = model.apply(var, batch["video"], method="encode_video")
        del v
        scale = jnp.minimum(
            jnp.exp(jax.lax.stop_gradient(
                params["text_encoder"]["logit_scale"])), 100.0)
        sim_title = losses.loose_similarity(q, t, scale)
        sim_loss_title = (losses.cross_en(sim_title)
                          + losses.cross_en(sim_title.T))
        loss = w_title * sim_loss_title
        return loss, {"loss": loss, "sim_loss_title": sim_loss_title}

    def step(state: FinetuneState, batch: Dict) -> Tuple[FinetuneState, Dict]:
        def lf(p, b):
            return loss_fn(p, b, state.batch_stats)

        grads, aux = _accumulate(lf, state.params, batch, n_accum)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        opt_state = _constrain_opt(opt_state, opt_shardings)
        params = optax.apply_updates(state.params, updates)
        return (state.replace(params=params, opt_state=opt_state,
                              step=state.step + 1), aux)

    return jax.jit(step, donate_argnums=0)


# ---------------------------------------------------------------------------
# pretrain step (BirdPretrainModel + MoCo)
# ---------------------------------------------------------------------------

def make_pretrain_step(
    model: BirdPretrainModel,
    tx: optax.GradientTransformation,
    cross_config: CrossConfig,
    task: TaskConfig,
    mask_token_id: int,
    pad_token_id: int,
    cls_token_id: int,
    n_accum: int = 1,
    opt_shardings: Any = None,
    fused_ema: bool = False,
) -> Callable:
    """Returns jitted (state, batch, rng) -> (state, metrics).

    batch keys: title_ids/title_mask [B,L]; tag_ids/tag_mask [B,L]
    (dataset=="bird" only); video [B,F,H,W,3].

    Step order matches modeling.py:334-436: query forwards; momentum EMA;
    key forwards (stop-grad); FAM/VTM/FTM losses vs queues; enqueue; MLM.

    Gradient accumulation (n_accum > 1) is QUEUE-CONSISTENT micro-batching:
    the reference steps its momentum EMA and queue once per FORWARD
    (``_momentum_update`` + ``_dequeue_and_enqueue`` live inside
    modeling.py:368-412), with the optimizer stepping every n_accum
    forwards — so each micro-batch here runs EMA -> key forwards -> losses
    against the CURRENT queue snapshot -> enqueue, inside a lax.scan, and
    the mean of the micro-grads feeds one optimizer update.

    ``fused_ema`` (opt-in, ``--fused_ema``): algebraically-identical
    restructure that moves each step's LAST momentum EMA across the step
    boundary — ``params_k`` is carried "pre-EMA'd for the next forward",
    so the final EMA of step t runs right after BertAdam's parameter
    write of step t and XLA fuses the two per-leaf passes (both read the
    freshly-updated params; saves one full fp32 read of the parameter
    tree per step). Fresh-run trajectories are EXACTLY equal (induction:
    k_1 = m*k_0 + (1-m)*p_1 = p_1 = copy-init when k_0 = copy(p_1), and
    both recurrences coincide thereafter); the only semantic difference
    is at CHECKPOINT boundaries — the saved params_k is one EMA
    application ahead of the reference's convention, so the flag must be
    kept consistent across ``--resume`` (mixing conventions drifts
    params_k by (1-m) of the (q - k) gap once).
    """
    use_tag = task.dataset == "bird"
    use_frame = task.use_frame_fea
    temp = task.contrast_temperature
    momentum = task.contrast_momentum
    w = cross_config

    def key_forwards(params_k, stats_k, batch, visual_stats):
        """Momentum towers, mutable BN stats on the key projector.
        ``visual_stats``: ResNet towers' BN running stats ({} for ViTs) —
        frozen in pretrain (query side never updates them either), so the
        key tower reads the shared query-side copy."""
        title_k = model.apply(
            {"params": {"text_encoder": params_k["text_encoder"]}},
            batch["title_ids"], batch["title_mask"], method="encode_text")
        tag_k = title_k
        if use_tag:
            tag_k = model.apply(
                {"params": {"text_encoder": params_k["text_encoder"]}},
                batch["tag_ids"], batch["tag_mask"], method="encode_text")
        visual_var = {"params": {"visual_encoder": params_k["visual_encoder"]}}
        if "visual_encoder" in visual_stats:
            visual_var["batch_stats"] = {
                "visual_encoder": visual_stats["visual_encoder"]}
        v_k, frame_k = model.apply(
            visual_var, batch["video"], method="encode_video")
        (frame_proj_k), new_stats = model.apply(
            {"params": {"v_projector": params_k["v_projector"]},
             "batch_stats": {"v_projector": stats_k["v_projector"]}},
            frame_k, True, method="project_frames_key",
            mutable=["batch_stats"])
        keys = dict(title_k=title_k, tag_k=tag_k, v_k=v_k, frame_k=frame_k,
                    frame_proj_k=frame_proj_k)
        keys = jax.lax.stop_gradient(keys)
        # merge so non-forwarded key towers' stats (t_projector) persist
        return keys, {**stats_k, **new_stats["batch_stats"]}

    def loss_fn(params, batch, rng, keys, queues, batch_stats):
        var = {"params": params, "batch_stats": batch_stats}
        # --- query forwards
        v_fea, frame_fea = model.apply(
            var, batch["video"], method="encode_video")
        title_fea = model.apply(var, batch["title_ids"], batch["title_mask"],
                                method="encode_text")
        tag_fea = title_fea
        if use_tag:
            tag_fea = model.apply(var, batch["tag_ids"], batch["tag_mask"],
                                  method="encode_text")
        (frame_proj, frame_pred), mut = model.apply(
            var, frame_fea, True, method="project_frames",
            mutable=["batch_stats"])
        del frame_proj  # only the prediction side enters FAM

        # --- FAM: adjacent-frame momentum contrast (modeling.py:385)
        loss_fam = losses.frame_self_loss(
            frame_pred, keys["frame_proj_k"], queues.frame_proj, temp)

        # --- VTM: video<->text vs queues (modeling.py:387-394)
        v_title = (losses.moco_contrastive(
                       v_fea, keys["title_k"], queues.title_cross, temp)
                   + losses.moco_contrastive(
                       title_fea, keys["v_k"], queues.v_cross, temp))
        if use_tag:
            v_tag = (losses.moco_contrastive(
                         v_fea, keys["tag_k"], queues.tag_cross, temp)
                     + losses.moco_contrastive(
                         tag_fea, keys["v_k"], queues.v_cross, temp))
            loss_vtm = (v_tag + v_title) / 2
        else:
            loss_vtm = v_title

        # --- FTM: frame<->text vs queues (modeling.py:396-405)
        loss_ftm = jnp.float32(0.0)
        if use_frame:
            f_title = losses.frame_cross_loss(
                frame_fea, keys["frame_k"], queues.frame_cross,
                title_fea, keys["title_k"], queues.title_cross, temp)
            if use_tag:
                f_tag = losses.frame_cross_loss(
                    frame_fea, keys["frame_k"], queues.frame_cross,
                    tag_fea, keys["tag_k"], queues.tag_cross, temp)
                loss_ftm = (f_tag + f_title) / 2
            else:
                loss_ftm = f_title

        # --- MLM (modeling.py:416-421)
        r_title, r_tag = jax.random.split(rng)

        def one_mlm(r, ids, mask):
            masked_ids, labels = mask_tokens(
                r, ids, model.vocab_size, mask_token_id, pad_token_id,
                cls_token_id, cross_config.mlm_probability)
            logits = model.apply(var, masked_ids, mask, method="mlm_logits")
            return mlm_loss(logits, labels)

        loss_mlm = one_mlm(r_title, batch["title_ids"], batch["title_mask"])
        if use_tag:
            loss_mlm = (loss_mlm + one_mlm(
                r_tag, batch["tag_ids"], batch["tag_mask"])) / 2

        loss = (w.weight_FAM * loss_fam + w.weight_VTM * loss_vtm
                + w.weight_FTM * loss_ftm + w.weight_MLM * loss_mlm)
        aux = {"loss": loss, "loss_FAM": loss_fam, "loss_VTM": loss_vtm,
               "loss_FTM": loss_ftm, "loss_MLM": loss_mlm,
               "batch_stats": mut["batch_stats"]}
        return loss, aux

    def one_micro(params, params_k, stats_k, batch_stats, queues, mb, rng,
                  ema_first: bool = True):
        """One forward's worth of MoCo state evolution: momentum EMA
        BEFORE key forwards (modeling.py:368-372), grads vs the CURRENT
        queue snapshot, then enqueue (modeling.py:412). Under
        ``fused_ema`` the first micro's EMA already happened at the END
        of the previous step (``ema_first=False``)."""
        if ema_first:
            params_k = momentum_update(params, params_k, momentum)
        keys, stats_k = key_forwards(params_k, stats_k, mb, batch_stats)

        def wrapped(p, b, r):
            return loss_fn(p, b, r, keys, queues, batch_stats)

        grads, aux = jax.grad(wrapped, has_aux=True)(params, mb, rng)
        new_batch_stats = aux.pop("batch_stats")
        queues = queues.enqueue(
            keys["v_k"], keys["tag_k"], keys["title_k"], keys["frame_k"],
            keys["frame_proj_k"])
        return params_k, stats_k, new_batch_stats, queues, grads, aux

    def step(state: PretrainState, batch: Dict, rng: jax.Array
             ) -> Tuple[PretrainState, Dict]:
        if n_accum == 1:
            (params_k, stats_k, batch_stats, queues, grads,
             aux) = one_micro(state.params, state.params_k,
                              state.batch_stats_k, state.batch_stats,
                              state.queues, batch, rng,
                              ema_first=not fused_ema)
        else:
            micro = _split_microbatches(batch, n_accum)
            rngs = jax.random.split(rng, n_accum)
            zero = jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, dtype=jnp.float32),
                state.params)

            def body(carry, xs):
                params_k, stats_k, batch_stats, queues, gacc = carry
                mb, r = xs
                (params_k, stats_k, batch_stats, queues, grads,
                 aux) = one_micro(state.params, params_k, stats_k,
                                  batch_stats, queues, mb, r)
                gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
                return (params_k, stats_k, batch_stats, queues, gacc), aux

            if fused_ema:
                # first micro's EMA already ran at the end of the
                # previous step; run it outside the scan, then the
                # remaining micros (EMA with the SAME pre-update params,
                # exactly like the unfused path) inside it
                (params_k, stats_k, batch_stats, queues, g0,
                 aux0) = one_micro(state.params, state.params_k,
                                   state.batch_stats_k, state.batch_stats,
                                   state.queues,
                                   jax.tree_util.tree_map(
                                       lambda x: x[0], micro),
                                   rngs[0], ema_first=False)
                carry0 = (params_k, stats_k, batch_stats, queues,
                          jax.tree_util.tree_map(jnp.add, zero, g0))
                rest = jax.tree_util.tree_map(lambda x: x[1:], micro)
                (params_k, stats_k, batch_stats, queues,
                 grads), auxes = jax.lax.scan(body, carry0,
                                              (rest, rngs[1:]))
                aux = jax.tree_util.tree_map(
                    lambda a0, a: (a0 + a.sum(0)) / n_accum, aux0, auxes)
            else:
                carry0 = (state.params_k, state.batch_stats_k,
                          state.batch_stats, state.queues, zero)
                (params_k, stats_k, batch_stats, queues,
                 grads), auxes = jax.lax.scan(body, carry0, (micro, rngs))
                # Mean over micro-batches (see _accumulate).
                aux = jax.tree_util.tree_map(lambda a: a.mean(0), auxes)
            grads = jax.tree_util.tree_map(lambda g: g / n_accum, grads)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        opt_state = _constrain_opt(opt_state, opt_shardings)
        params = optax.apply_updates(state.params, updates)
        if fused_ema:
            # next step's first EMA, adjacent to BertAdam's parameter
            # write so XLA fuses the two per-leaf passes over the
            # freshly-updated params
            params_k = momentum_update(params, params_k, momentum)
        new_state = state.replace(
            params=params, params_k=params_k, batch_stats=batch_stats,
            batch_stats_k=stats_k, opt_state=opt_state, queues=queues,
            step=state.step + 1)
        aux["grad_norm"] = optax.global_norm(grads)
        return new_state, aux

    return jax.jit(step, donate_argnums=0)
