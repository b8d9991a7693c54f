"""Execute the ACTUAL reference implementation side-by-side with ours.

Requires a read-only checkout of cheetah003/HMMC (default /root/reference;
override with --reference). Loads the reference's own modules (stubbing
its unused boto3/requests imports), builds its VisualEncoder/TextEncoder
at a tiny geometry from a synthetic CLIP checkpoint, loads OUR exported
weights into them, and compares:

  1. text tower pooled features         (module_cross.py:287-305)
  2. video feature + frame features     (module_cross.py:178-216)
  3. loose_similarity logits            (modeling.py:207-229)
  4. CrossEn / Dual_CrossEn / MILNCE / MaxMargin losses (until_module.py)
  5. metrics: t2v + v2t, single- and multi-sentence     (metrics.py)
  6. BertAdam: 4 update steps through the 6 param groups (optimization.py)
  7. BirdModel / BirdModel_VT fine-tune steps: loss AND the full
     parameter-gradient tree vs the reference's autograd (modeling.py:682-785)
  8. ONE full MoCo pretrain step through BirdPreTrainedModel.forward at
     tiny and flagship ViT-B/32 geometry               (modeling.py:334-436)

This is the strongest parity evidence available without data: the
comparison target is the reference's executed code, not a re-derivation.

  python tools/parity_vs_reference.py [--reference /root/reference]
"""

from __future__ import annotations

import argparse
import contextlib
import importlib.machinery
import importlib.util
import logging
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASS, FAIL = 0, 0


def check(name: str, a, b, atol: float = 1e-4):
    global PASS, FAIL
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    diff = float(np.max(np.abs(a - b))) if a.size else 0.0
    ok = diff <= atol
    PASS += ok
    FAIL += (not ok)
    print(f"  {'OK  ' if ok else 'FAIL'} {name}: max diff {diff:.2e}")


def load_reference(root: str):
    # stub ONLY the genuinely missing third-party deps of the reference's
    # file_utils (download machinery we never exercise) and diffdist
    # (single-process all_gather is the identity; modeling.dist_collect is
    # monkeypatched to it before any forward)
    for fake in ("boto3", "botocore", "botocore.exceptions", "tqdm",
                 "diffdist", "diffdist.functional", "ftfy"):
        try:
            importlib.import_module(fake)
            continue
        except ImportError:
            pass
        m = types.ModuleType(fake)
        m.__spec__ = importlib.machinery.ModuleSpec(fake, None)
        if fake == "botocore.exceptions":
            m.ClientError = type("ClientError", (Exception,), {})
        if fake == "tqdm":
            m.tqdm = lambda *a, **k: (a[0] if a else None)
        if fake == "diffdist.functional":
            m.all_gather = None  # never called (dist_collect patched)
            sys.modules["diffdist"].functional = m
        if fake == "ftfy":
            m.fix_text = lambda t: t  # tokenizer text path never exercised
        sys.modules[fake] = m
    pkg = types.ModuleType("modules")
    pkg.__path__ = [os.path.join(root, "modules")]
    sys.modules["modules"] = pkg
    sys.path.insert(0, root)
    import modules.module_clip as mclip

    mclip.convert_weights = lambda model: None  # keep fp32 on CPU
    import modules.module_cross as mcross
    import modules.until_module as um

    spec = importlib.util.spec_from_file_location(
        "ref_metrics", os.path.join(root, "metrics.py"))
    rmetrics = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rmetrics)
    spec = importlib.util.spec_from_file_location(
        "ref_opt", os.path.join(root, "modules", "optimization.py"))
    ropt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ropt)
    return mcross, um, rmetrics, ropt


def _check_chinese(mcross, tmp, check):
    """Reference TextEncoder(language=chinese) builds its tower via
    AutoModel.from_pretrained (module_cross.py:260-265); point it at a
    local synthetic HF BertModel dir, load OUR exported zh weights into
    it, and compare pooled text features."""
    import json

    import torch

    import jax
    import jax.numpy as jnp

    from hmmc_tpu.config import ClipArch, CrossConfig
    from hmmc_tpu.models.retrieval import BirdModel
    from hmmc_tpu.train.orbax_io import save_reference_checkpoint

    ZH_VOCAB, ZH_H, ZH_L = 50, 32, 2
    hf_dir = os.path.join(tmp, "hf_zh")
    os.makedirs(hf_dir, exist_ok=True)
    with open(os.path.join(hf_dir, "config.json"), "w") as f:
        json.dump({
            "architectures": ["BertModel"], "model_type": "bert",
            "vocab_size": ZH_VOCAB, "hidden_size": ZH_H,
            "num_hidden_layers": ZH_L, "num_attention_heads": 2,
            "intermediate_size": 64, "max_position_embeddings": 512,
            "hidden_act": "gelu", "hidden_dropout_prob": 0.0,
            "attention_probs_dropout_prob": 0.0}, f)
    from transformers import BertConfig, BertModel

    hf = BertModel(BertConfig.from_json_file(
        os.path.join(hf_dir, "config.json")))
    hf.save_pretrained(hf_dir, safe_serialization=False)

    arch = ClipArch(
        embed_dim=32, image_resolution=32, vision_layers=2,
        vision_width=64, vision_patch_size=16, context_length=16,
        vocab_size=512, transformer_width=64, transformer_heads=1,
        transformer_layers=2)
    cross = CrossConfig(temporal_hidden_size=32,
                        temporal_attention_heads=2,
                        temporal_hidden_layers=2,
                        max_position_embeddings=8, chinese_hidden_size=ZH_H,
                        chinese_num_layers=ZH_L, chinese_num_heads=2,
                        chinese_intermediate_size=64)
    model = BirdModel(arch, cross, language="chinese",
                      chinese_vocab_size=ZH_VOCAB)
    ids0 = jnp.zeros((1, 10), jnp.int32)
    params = model.init(jax.random.PRNGKey(3), ids0,
                        jnp.ones((1, 10), jnp.int32),
                        jnp.zeros((1, 2, 32, 32, 3)))["params"]
    zh_ckpt = os.path.join(tmp, "ours_zh.bin")
    save_reference_checkpoint(zh_ckpt, params, language="chinese")
    sd = torch.load(zh_ckpt, map_location="cpu", weights_only=True)

    task_ns = types.SimpleNamespace(local_rank=0, rank=0, use_temp=True,
                                    language="chinese",
                                    pretrained_text=hf_dir)
    cc = mcross.CrossConfig(vocab_size_or_config_json_file=0)
    for k, v in dict(temporal_hidden_size=32, chinese_hidden_size=ZH_H,
                     pretrained_clip_name="unused-for-zh").items():
        setattr(cc, k, v)
    # the zh branch never builds CLIP? it does (TextEncoder ctor builds
    # clip for logit_scale) — reuse the tiny clip file
    cc.pretrained_clip_name = os.path.join(tmp, "TinyCLIP.pt")
    te = mcross.TextEncoder(task_ns, cc)
    te_sd = {k[len("text_encoder."):]: v for k, v in sd.items()
             if k.startswith("text_encoder.") and "logit_scale" not in k}
    te.load_state_dict(te_sd, strict=True)
    te = te.float().eval()

    rng = np.random.default_rng(9)
    ids = rng.integers(1, ZH_VOCAB, size=(3, 10)).astype(np.int64)
    mask = np.ones((3, 10), np.int64)
    mask[0, 7:] = 0
    with torch.no_grad():
        tq = te(torch.tensor(ids), torch.tensor(mask))
    q = model.apply({"params": params}, jnp.asarray(ids.astype(np.int32)),
                    jnp.asarray(mask.astype(np.int32)),
                    method="encode_text")
    check("zh pooled text feature", np.asarray(q), tq.numpy(), 2e-5)


def _make_hf_config_dir(tmp: str, name: str, hidden: int = 32) -> str:
    """Minimal local HF config dir so AutoConfig.from_pretrained resolves
    (BirdPreTrainedModel reads it for the MLM head config,
    modeling.py:110-120; hidden_size/vocab_size are overridden there)."""
    import json

    d = os.path.join(tmp, name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({
            "architectures": ["BertModel"], "model_type": "bert",
            "vocab_size": 50, "hidden_size": hidden,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "intermediate_size": 64, "max_position_embeddings": 512,
            "hidden_act": "gelu", "layer_norm_eps": 1e-12}, f)
    return d


def _fixed_mlm_mask_ours(rng, input_ids, vocab_size, mask_token_id,
                         pad_token_id, cls_token_id, mlm_probability=0.15):
    """Deterministic stand-in for models.pretrain.mask_tokens: mask every
    position with index % 5 == 2 (minus pad/cls) and always take the
    '80%' [MASK]-replacement branch — same rule as the reference-side
    injection, so both engines see identical masked inputs + labels."""
    import jax.numpy as jnp

    pos = (jnp.arange(input_ids.shape[-1]) % 5) == 2
    masked = jnp.broadcast_to(pos, input_ids.shape)
    masked = masked & (input_ids != pad_token_id) & (
        input_ids != cls_token_id)
    labels = jnp.where(masked, input_ids, -100)
    out = jnp.where(masked, mask_token_id, input_ids)
    return out, labels


def check_pretrain_full(rmod, mcross, tmp, check, geom, jit, tag):
    """ONE full MoCo pretrain step through the reference's OWN
    BirdPreTrainedModel.forward (modeling.py:334-436) vs our jitted
    make_pretrain_step: all four losses + total, post-EMA key towers,
    post-enqueue queues + ptr, and post-step BN running stats.

    A fixed MLM mask is injected on BOTH sides (the only randomness in
    the step); dist_collect is the single-process identity."""
    import contextlib

    import torch

    import jax
    import jax.numpy as jnp
    import optax

    import hmmc_tpu.train.trainer as trainer_mod
    from hmmc_tpu.config import ClipArch, CrossConfig, TaskConfig
    from hmmc_tpu.models.pretrain import BirdPretrainModel, MoCoQueues
    from hmmc_tpu.train.orbax_io import save_reference_checkpoint
    from hmmc_tpu.train.trainer import PretrainState, make_pretrain_step

    g = geom
    PAD, CLS, MASKID = g["pad"], g["cls"], g["mask"]
    ftag = tag.replace("/", "-")  # tags appear in file names

    arch = ClipArch(
        embed_dim=g["emb"], image_resolution=g["res"],
        vision_layers=g["vlayers"], vision_width=g["w"],
        vision_patch_size=g["patch"], context_length=g["ctx"],
        vocab_size=g["vocab"], transformer_width=g["tw"],
        transformer_heads=g["tw"] // 64, transformer_layers=g["tlayers"])
    cross = CrossConfig(
        temporal_hidden_size=g["emb"],
        temporal_attention_heads=g["theads"],
        temporal_hidden_layers=g["temporal_layers"],
        max_position_embeddings=max(8, g["frames"]))
    task = TaskConfig(
        do_pretrain=True, dataset="bird", language="english",
        use_temp=True, use_frame_fea=True, max_frames=g["frames"],
        contrast_num_negative=g["K"], compute_dtype="float32",
        top_frames=1)

    # ---- ours: build, create state, export EVERYTHING for the reference
    model = BirdPretrainModel(vocab_size=g["vocab"], arch=arch,
                              cross_config=cross)
    ids0 = jnp.zeros((1, g["ctx"]), jnp.int32)
    mask0 = jnp.ones((1, g["ctx"]), jnp.int32)
    vid0 = jnp.zeros((1, g["frames"], g["res"], g["res"], 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(21), ids0, mask0, vid0)
    # host snapshot: the jitted steps donate their state, so the gradient
    # run below needs a fresh, still-valid copy of the initial variables
    variables_host = jax.tree_util.tree_map(np.array, variables)
    tx = optax.set_to_zero()  # isolate the step from optimizer choice
    queues = MoCoQueues.create(jax.random.PRNGKey(7), g["emb"], g["K"],
                               g["frames"])
    state = PretrainState.create(variables, tx, queues)
    before = os.path.join(tmp, f"pretrain_before_{ftag}.bin")
    save_reference_checkpoint(before, state.params, language="english",
                              pretrain_state=state)
    sd_before = torch.load(before, map_location="cpu", weights_only=True)

    # synthetic CLIP file at this geometry so the reference ctors build
    clip_sd = {}
    for k, v in sd_before.items():
        if k.startswith("visual_encoder.visual."):
            clip_sd[k[len("visual_encoder."):]] = v
        elif (k.startswith("text_encoder.")
              and not k.startswith("text_encoder_k.")):
            kk = k[len("text_encoder."):]
            if kk != "logit_scale" and "chinese" not in kk:
                clip_sd[kk] = v
    clip_sd["logit_scale"] = sd_before["text_encoder.logit_scale"]
    clip_path = os.path.join(tmp, f"PretrainCLIP_{ftag}.pt")
    torch.save(clip_sd, clip_path)

    # ---- reference model
    hf_dir = _make_hf_config_dir(tmp, f"hf_en_{ftag}")
    task_ns = types.SimpleNamespace(
        local_rank=0, rank=0, use_temp=True, language="english",
        pretrained_text=hf_dir, top_frames=1, contrast_momentum=0.99,
        contrast_temperature=0.07, contrast_num_negative=g["K"],
        max_frames=g["frames"], n_display=10 ** 9, dataset="bird",
        use_frame_fea=True, logdir="")
    cc = mcross.CrossConfig(vocab_size_or_config_json_file=0)
    for k, v in dict(
            temporal_hidden_size=g["emb"],
            temporal_attention_heads=g["theads"],
            temporal_hidden_layers=g["temporal_layers"],
            max_position_embeddings=max(8, g["frames"]),
            chinese_hidden_size=32, mlm_probability=0.15,
            weight_FAM=0.05, weight_VTM=0.45, weight_FTM=0.45,
            weight_MLM=0.05, proj_num_layers=2, pred_num_layers=2,
            pretrained_clip_name=clip_path).items():
        setattr(cc, k, v)

    class _StubTok:
        vocab_size = g["vocab"]
        pad_token_id = PAD
        cls_token_id = CLS
        mask_token_id = MASKID

        def __init__(self, *a, **k):
            pass

    # single-process semantics + CPU execution for the reference engine
    rmod.dist_collect = lambda x: x
    torch.Tensor.cuda = lambda self, *a, **k: self
    _patch_ref_layernorm()

    def ref_fixed_mask(input_ids, vocab_size, device, targets=None,
                       masked_indices=None, probability_matrix=None):
        pos = (torch.arange(input_ids.shape[-1]) % 5) == 2
        mi = pos.unsqueeze(0).expand_as(input_ids).clone()
        mi &= (input_ids != PAD) & (input_ids != CLS)
        if targets is not None:
            targets[~mi] = -100
        input_ids[mi] = MASKID
        if targets is not None:
            return input_ids, targets
        return input_ids

    def build_ref(dtype=torch.float32):
        orig_tok = rmod.ClipTokenizer
        rmod.ClipTokenizer = _StubTok
        try:
            rm = rmod.BirdPreTrainedModel(cc, task_ns)
        finally:
            rmod.ClipTokenizer = orig_tok
        if g["emb"] != 512:
            # reference quirk: MLP in/out dims are HARD-CODED to 512
            # (modeling.py:789) — it only works because
            # temporal_hidden_size is 512 in every shipped config. At tiny
            # geometry, swap in correctly-sized instances of the
            # reference's own MLP class post-construction (and rebuild
            # model_pairs so the momentum EMA sees them); the flagship
            # geometry runs the ctor untouched.
            for name in ("t_projector", "t_projector_k", "v_projector",
                         "v_projector_k", "v_predictor"):
                nl = 2
                setattr(rm,
                        name, torch.nn.SyncBatchNorm.convert_sync_batchnorm(
                            rmod.MLP(in_dim=g["emb"], inner_dim=4096,
                                     out_dim=g["emb"], num_layers=nl)))
            rm.model_pairs = [
                [rm.visual_encoder, rm.visual_encoder_k],
                [rm.text_encoder, rm.text_encoder_k],
                [rm.v_projector, rm.v_projector_k],
                [rm.t_projector, rm.t_projector_k]]
        rm = rm.to(dtype)
        # TextEncoder freezes self.dtype at ctor time as a plain attribute
        # (module_cross.py:256) so .to(float64) leaves it fp32 and
        # encode_text's .type(self.dtype) re-casts activations mid-model;
        # re-pin it on BOTH text towers (VisualEncoder's dtype is a live
        # property, :219-220)
        rm.text_encoder.dtype = dtype
        rm.text_encoder_k.dtype = dtype
        # logit_scale is a plain tensor attribute on the reference
        # TextEncoder (module_cross.py:250 deepcopies it from the CLIP
        # state dict) — not a registered param/buffer, so it must bypass
        # load_state_dict. fp32 checkpoint values widen exactly into a
        # float64 model: both precisions start from bit-identical weights.
        load_sd = dict(sd_before)
        for enc in ("text_encoder", "text_encoder_k"):
            ls = load_sd.pop(f"{enc}.logit_scale", None)
            if ls is not None:
                getattr(rm, enc).logit_scale = ls.clone().to(dtype)
        missing, unexpected = rm.load_state_dict(load_sd, strict=False)
        benign = {"cls.decoder.bias"}  # tied twin of the loaded cls.bias
        assert not unexpected, f"unexpected keys: {unexpected[:5]}"
        assert set(missing) <= benign, f"missing keys: {missing[:5]}"
        rm.mask = ref_fixed_mask
        return rm.train()

    rm = build_ref()
    rec = {}

    def record(name, fn):
        def w(*a, **k):
            out = fn(*a, **k)
            rec.setdefault(name, []).append(float(out))
            return out
        return w

    rm.frame_self_loss = record("FAM", rm.frame_self_loss)
    rm.frame_cross_loss = record("FTM", rm.frame_cross_loss)
    rm.get_mlm_loss = record("MLM", rm.get_mlm_loss)

    # ---- shared batch
    rng = np.random.default_rng(17)
    B, F, L = g["batch"], g["frames"], g["ctx"]

    def make_ids():
        ids = rng.integers(2, g["vocab"] - 2, size=(B, L)).astype(np.int64)
        ids[:, 0] = CLS
        for r in range(B):
            ids[r, 6 + r:] = PAD
        return ids

    tag_ids, title_ids = make_ids(), make_ids()
    tag_mask = (tag_ids != PAD).astype(np.int64)
    tag_mask[:, 0] = 1
    title_mask = (title_ids != PAD).astype(np.int64)
    title_mask[:, 0] = 1
    video = rng.normal(size=(B, F, 3, g["res"], g["res"])).astype(
        np.float32)

    ref_loss = rm(torch.tensor(video), F, torch.tensor(tag_ids),
                  torch.tensor(tag_mask), torch.tensor(title_ids),
                  torch.tensor(title_mask), 1)

    # ---- our jitted step on the same inputs
    trainer_mod.mask_tokens = _fixed_mlm_mask_ours
    step_fn = make_pretrain_step(model, tx, cross, task,
                                 mask_token_id=MASKID, pad_token_id=PAD,
                                 cls_token_id=CLS)
    batch = {
        "title_ids": jnp.asarray(title_ids.astype(np.int32)),
        "title_mask": jnp.asarray(title_mask.astype(np.int32)),
        "tag_ids": jnp.asarray(tag_ids.astype(np.int32)),
        "tag_mask": jnp.asarray(tag_mask.astype(np.int32)),
        "video": jnp.asarray(video.transpose(0, 1, 3, 4, 2)),
    }
    ctx = contextlib.nullcontext() if jit else jax.disable_jit()
    with ctx:
        new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))

    # ---- losses (VTM derived from the total: the reference computes it
    # inline, the other three via the recorded methods)
    fam = rec["FAM"][0]
    ftm = sum(rec["FTM"]) / len(rec["FTM"])
    mlm = sum(rec["MLM"]) / len(rec["MLM"])
    total = float(ref_loss)
    vtm = (total - 0.05 * fam - 0.45 * ftm - 0.05 * mlm) / 0.45
    tol = g.get("tol", 1e-4)
    check(f"{tag} loss_FAM", float(metrics["loss_FAM"]), fam, tol)
    check(f"{tag} loss_VTM", float(metrics["loss_VTM"]), vtm, tol)
    check(f"{tag} loss_FTM", float(metrics["loss_FTM"]), ftm, tol)
    check(f"{tag} loss_MLM", float(metrics["loss_MLM"]), mlm, tol)
    check(f"{tag} total loss", float(metrics["loss"]), total, tol)

    # ---- post-step state: EMA'd keys, queues+ptr, BN running stats
    after = os.path.join(tmp, f"pretrain_after_{ftag}.bin")
    save_reference_checkpoint(after, new_state.params, language="english",
                              pretrain_state=new_state)
    sd_after = torch.load(after, map_location="cpu", weights_only=True)
    ref_after = {k: v.detach().float().numpy()
                 for k, v in rm.state_dict().items()}
    groups = {
        "EMA key towers": lambda k: ("_k." in k),
        "queues": lambda k: k.startswith("queue_") and k != "queue_ptr",
        "queue_ptr": lambda k: k == "queue_ptr",
        "BN running stats": lambda k: "running_" in k and "_k." not in k,
        "query towers (unchanged)": lambda k: (
            "_k." not in k and not k.startswith("queue_")
            and "running_" not in k),
    }
    worst = {name: 0.0 for name in groups}
    ref_after["text_encoder.logit_scale"] = (
        rm.text_encoder.logit_scale.detach().float().numpy())
    ref_after["text_encoder_k.logit_scale"] = (
        rm.text_encoder_k.logit_scale.detach().float().numpy())
    for k, v in sd_after.items():
        if "num_batches_tracked" in k:
            continue
        assert k in ref_after, f"{k} not in reference state_dict"
        d = float(np.max(np.abs(np.asarray(v, np.float64)
                                - np.asarray(ref_after[k], np.float64))))
        for name, pred in groups.items():
            if pred(k):
                worst[name] = max(worst[name], d)
                break
    for name, d in worst.items():
        check(f"{tag} {name}", d, 0.0, tol)

    if not g.get("grads", True):
        return

    # ---- gradient parity: the SAME composed MoCo step differentiated,
    # vs the reference's autograd through BirdPreTrainedModel.forward.
    # Our grads via optax.scale(-1): params_before - params_after IS the
    # raw gradient. The EMA'd key towers still see the PRE-update query
    # params (one_micro EMAs before tx.update fires, exactly like the
    # reference's no_grad momentum update at modeling.py:368-372), so the
    # grad run's MoCo state evolves identically to the zero-update run.
    state_g = PretrainState.create(
        jax.tree_util.tree_map(jnp.asarray, variables_host),
        optax.scale(-1.0),
        MoCoQueues.create(jax.random.PRNGKey(7), g["emb"], g["K"],
                          g["frames"]))
    step_g = make_pretrain_step(model, optax.scale(-1.0), cross, task,
                                mask_token_id=MASKID, pad_token_id=PAD,
                                cls_token_id=CLS)
    with contextlib.nullcontext() if jit else jax.disable_jit():
        new_g, _ = step_g(state_g, batch, jax.random.PRNGKey(0))
    grads = jax.tree_util.tree_map(
        lambda a, b: np.asarray(a, np.float64) - np.asarray(b, np.float64),
        variables_host["params"],
        jax.tree_util.tree_map(np.asarray, new_g.params))
    gpath = os.path.join(tmp, f"pretrain_grads_{ftag}.bin")
    # new_g rides along only to give the exporter the key-tower/BN/queue
    # structure it expects; every compared name comes from ``grads``
    save_reference_checkpoint(gpath, grads, language="english",
                              pretrain_state=new_g)
    ograds = {k: v.numpy() for k, v in torch.load(
        gpath, map_location="cpu", weights_only=True).items()}

    # reference autograd: fp32 (from the forward already executed above)
    # and a float64 ground-truth run; each tensor's fp32 rounding envelope
    # |ref32 - ref64| calibrates its tolerance (see _compare_grads)
    ref_loss.backward()
    rgrads32 = {n: p.grad.detach().to(torch.float64).numpy()
                for n, p in rm.named_parameters() if p.grad is not None}
    with _f64_truth_mode():
        rm64 = build_ref(torch.float64)
        ref_loss64 = rm64(torch.tensor(video).double(), F,
                          torch.tensor(tag_ids), torch.tensor(tag_mask),
                          torch.tensor(title_ids),
                          torch.tensor(title_mask), 1)
        ref_loss64.backward()
    rgrads64 = {n: p.grad.detach().numpy()
                for n, p in rm64.named_parameters() if p.grad is not None}
    assert set(rgrads32) == set(rgrads64)
    # floor=5e-6: the MoCo step composes 4 weighted losses over B x (1+K)
    # softmaxes, so some tensors land ~2.4e-6 from the f64 truth while the
    # reference's own fp32 envelope there is an unusually tight 2e-7
    # (measured on the temporal out_proj at tiny geometry, 2026-08-19) —
    # the ratio is brittle where the envelope is near zero, and a semantic
    # mismatch still shows as diffs of 1e-3..1e-1, 1000x this floor.
    _compare_grads(check, f"{tag} BirdPreTrainedModel.forward", ograds,
                   rgrads32, rgrads64, floor=5e-6)


def check_resnet_tower(mcross, tmp, check):
    """Execute the reference's ModifiedResNet + AttentionPool2d visual
    encoder (module_clip.py:68-214 via module_cross.py:152-237) with OUR
    exported RN weights and compare encode_video in both BN modes.

    Tiny RN geometry with embed_dim == temporal_hidden_size, so the
    reference's frame-position-embedding add (module_cross.py:198) lines
    up — at real RN50 (embed 1024) the shipped cross-base config (512)
    makes that add throw, which is why the reference never trains RN."""
    import torch

    import jax
    import jax.numpy as jnp

    from hmmc_tpu.config import ClipArch, CrossConfig
    from hmmc_tpu.models.retrieval import BirdModel
    from hmmc_tpu.train.orbax_io import save_reference_checkpoint

    EMB, RES, W, CTX, VOCAB, TW, F, B = 48, 64, 16, 12, 128, 64, 3, 4
    arch = ClipArch(
        embed_dim=EMB, image_resolution=RES, vision_layers=(1, 1, 1, 1),
        vision_width=W, vision_patch_size=0, context_length=CTX,
        vocab_size=VOCAB, transformer_width=TW, transformer_heads=1,
        transformer_layers=2)
    cross = CrossConfig(temporal_hidden_size=EMB,
                        temporal_attention_heads=2,
                        temporal_hidden_layers=2,
                        max_position_embeddings=8)
    model = BirdModel(arch, cross)
    variables = model.init(
        jax.random.PRNGKey(7), jnp.zeros((1, CTX), jnp.int32),
        jnp.ones((1, CTX), jnp.int32),
        jnp.zeros((1, F, RES, RES, 3), jnp.float32))
    params, bstats = variables["params"], variables["batch_stats"]
    ours_ckpt = os.path.join(tmp, "ours_rn.bin")
    save_reference_checkpoint(ours_ckpt, params, language="english",
                              batch_stats=bstats)
    sd_full = torch.load(ours_ckpt, map_location="cpu", weights_only=True)
    clip_sd = {}
    for k, v in sd_full.items():
        if k.startswith("visual_encoder.visual."):
            clip_sd[k[len("visual_encoder."):]] = v
        elif k.startswith("text_encoder.") and "chinese" not in k:
            kk = k[len("text_encoder."):]
            if kk != "logit_scale":
                clip_sd[kk] = v
    clip_sd["logit_scale"] = sd_full["text_encoder.logit_scale"]
    clip_path = os.path.join(tmp, "TinyRN.pt")
    torch.save(clip_sd, clip_path)

    task_ns = types.SimpleNamespace(local_rank=0, rank=0, use_temp=True,
                                    language="english",
                                    pretrained_text="unused")
    cc = mcross.CrossConfig(vocab_size_or_config_json_file=0)
    for k, v in dict(
            temporal_hidden_size=EMB, temporal_attention_heads=2,
            temporal_hidden_layers=2, max_position_embeddings=8,
            chinese_hidden_size=32,
            pretrained_clip_name=clip_path).items():
        setattr(cc, k, v)

    ve = mcross.VisualEncoder(task_ns, cc)
    ve_sd = {k[len("visual_encoder."):]: v for k, v in sd_full.items()
             if k.startswith("visual_encoder.")}
    ve.load_state_dict(ve_sd, strict=True)
    ve = ve.float().eval()

    rng = np.random.default_rng(9)
    video = rng.normal(size=(B, F, 3, RES, RES)).astype(np.float32)
    with torch.no_grad():
        tv, tf = ve(torch.tensor(video), F)
    v, f = model.apply({"params": params, "batch_stats": bstats},
                       jnp.asarray(video.transpose(0, 1, 3, 4, 2)),
                       method="encode_video")
    check("RN video feature (eval BN)", np.asarray(v), tv.numpy())
    check("RN frame features (eval BN)", np.asarray(f), tf.numpy())

    # train mode: both sides normalize by the (biased) batch statistics.
    # (Running-stat ACCUMULATION differs by the torch-unbiased/flax-biased
    # variance convention — irrelevant to any reference behavior, since
    # the reference cannot train RN towers at all.)
    ve = ve.train()
    with torch.no_grad():
        tv2, _ = ve(torch.tensor(video), F)
    (v2, _f2), _mut = model.apply(
        {"params": params, "batch_stats": bstats},
        jnp.asarray(video.transpose(0, 1, 3, 4, 2)), None, True,
        method="encode_video", mutable=["batch_stats"])
    check("RN video feature (train BN)", np.asarray(v2), tv2.numpy())


def _patch_ref_layernorm():
    """The reference's LayerNorm subclass force-casts its INPUT to fp32
    (module_clip.py:222 — there to undo fp16 weight storage, which is
    already disabled via convert_weights). Under a float64 model torch
    raises "mixed dtype"; a dtype-preserving F.layer_norm is bit-identical
    on the fp32 path (input is already fp32) and correct at f64."""
    import torch

    mclip_mod = sys.modules["modules.module_clip"]

    def _ln_native_dtype(self, x):
        return torch.nn.functional.layer_norm(
            x, self.normalized_shape, self.weight, self.bias, self.eps)

    mclip_mod.LayerNorm.forward = _ln_native_dtype


@contextlib.contextmanager
def _f64_truth_mode():
    """The reference hard-casts its encoder outputs to fp32
    (``x.float()``, module_cross.py:236-237,302-305 — there to undo fp16
    weight storage, which is already disabled here). Under a float64
    ground-truth model that cast truncates mid-model and then crashes the
    f32xf64 matmul at modeling.py:223. Make ``.float()`` dtype-PRESERVING
    for floating tensors for the duration of the f64 forward/backward
    only; fp32 runs are untouched (there the cast is a no-op anyway, so
    both precisions execute the same math)."""
    import torch

    orig = torch.Tensor.float

    def _keep(self, *a, **k):
        return self if self.is_floating_point() else orig(self, *a, **k)

    torch.Tensor.float = _keep
    try:
        yield
    finally:
        torch.Tensor.float = orig


def _compare_grads(check, tag, ours, ref32, ref64, floor=2e-6, mult=8.0):
    """Self-calibrating gradient comparison: per-tensor, our fp32 grad's
    distance from the reference's f64 ground truth must sit within
    ``mult`` x the reference's OWN fp32 rounding envelope |ref32 - ref64|
    (plus a tiny absolute floor for tensors whose envelope is ~0). mult=8:
    our batched/scanned reductions (e.g. the FTM frame loop runs as one
    einsum, the reference as a Python per-frame loop) have a legitimately
    different fp32 rounding envelope — measured worst 5.2x the reference's
    own noise on the composed BirdModel step (2026-08-19); a semantic
    mismatch shows up as 100-1000x."""
    worst, wname, wdiff, wnoise = 0.0, "", 0.0, 0.0
    for n, g64 in ref64.items():
        assert n in ours, f"{n} missing from exported grads"
        g64 = np.asarray(g64, np.float64)
        diff = float(np.max(np.abs(
            np.asarray(ours[n], np.float64) - g64)))
        noise = float(np.max(np.abs(
            np.asarray(ref32[n], np.float64) - g64)))
        allowed = max(mult * noise, floor)
        if diff / allowed > worst:
            worst, wname, wdiff, wnoise = diff / allowed, n, diff, noise
    check(f"{tag} grads within {mult:g}x the reference's own fp32 "
          f"noise of the f64 truth ({len(ref64)} tensors; "
          f"worst={wname}: ours {wdiff:.2e}, ref-fp32 noise "
          f"{wnoise:.2e}; value is the ratio)", worst, 0.0, 1.0)


def check_finetune_full(rmod, mcross, tmp, check, sd_full, clip_path,
                        model, params, cross, geom):
    """ONE fine-tune training step's loss AND full parameter-gradient tree
    through the reference's OWN composed forwards:

      - BirdModel.forward (modeling.py:682-722) with use_frame_fea=True, so
        both the VTM symmetric CrossEn and the per-frame FTM loop fire;
      - BirdModel_VT.forward (modeling.py:744-785) — the reference reads the
        UNDEFINED ``self.weight_title`` at modeling.py:773 (latent crash,
        see PARITY.md "fixed gaps"); it is set here so the reference code
        can execute at all, to the same value our CrossConfig supplies.

    Gradients are compared tensor-by-tensor: reference ``loss.backward()``
    grads vs our jitted ``make_finetune_step`` with ``optax.scale(-1)``
    (so params_before - params_after IS the raw gradient), exported through
    the same flax->torch name/layout map the checkpoints use. This is
    end-to-end evidence that the whole differentiated computation — towers,
    normalize-then-mean quirk, loose_similarity, loss composition — matches
    the reference's autograd, not just its forward values.

    Tolerances are SELF-CALIBRATING: fp32 backward noise is amplified
    ~100x by the exp(logit_scale) factor inside the softmax losses, so a
    fixed atol is either meaninglessly loose or fails on rounding noise.
    Instead the reference itself is run TWICE — float64 (ground truth)
    and float32 — and each tensor's fp32 rounding envelope
    ``|ref32 - ref64|`` becomes its tolerance: our fp32 grads must sit
    within a small multiple of the reference's OWN fp32 noise floor from
    the f64 truth. A semantic mismatch would exceed that floor by orders
    of magnitude; a different-but-equivalent reduction order cannot."""
    import torch

    import jax
    import jax.numpy as jnp
    import optax

    from hmmc_tpu.train.orbax_io import save_reference_checkpoint
    from hmmc_tpu.train.trainer import (FinetuneState, make_finetune_step,
                                        make_finetune_vt_step)

    g = geom
    EMB, CTX, VOCAB, RES, F, B = (g["emb"], g["ctx"], g["vocab"], g["res"],
                                  g["frames"], g["batch"])
    # the caller's params are exactly what sd_full holds (it was exported
    # from them), so both engines start from identical weights
    params0 = jax.tree_util.tree_map(np.array, params)

    # ---- reference models, single-process semantics
    task_ns = types.SimpleNamespace(
        local_rank=0, rank=0, use_temp=True, language="english",
        pretrained_text="unused", top_frames=1, use_frame_fea=True,
        n_display=10 ** 9, logdir="")
    cc = mcross.CrossConfig(vocab_size_or_config_json_file=0)
    for k, v in dict(
            temporal_hidden_size=EMB, temporal_attention_heads=g["theads"],
            temporal_hidden_layers=g["temporal_layers"],
            max_position_embeddings=8, chinese_hidden_size=32,
            weight_VTM_finetune=0.85, weight_FTM_finetune=0.15,
            pretrained_clip_name=clip_path).items():
        setattr(cc, k, v)
    rmod.dist_collect = lambda x: x
    _patch_ref_layernorm()

    def build_ref(cls, dtype=torch.float32):
        rm = cls(cc, task_ns).to(dtype)
        # TextEncoder freezes self.dtype at ctor time as a plain attribute
        # (module_cross.py:256) so .to(float64) leaves it fp32 and
        # encode_text's .type(self.dtype) re-casts activations mid-model;
        # re-pin it (VisualEncoder's dtype is a live property, :219-220)
        rm.text_encoder.dtype = dtype
        load_sd = dict(sd_full)
        rm.text_encoder.logit_scale = load_sd.pop(
            "text_encoder.logit_scale").clone().to(dtype)
        # fp32 checkpoint values widen exactly into a float64 model: both
        # precisions start from bit-identical weights
        missing, unexpected = rm.load_state_dict(load_sd, strict=False)
        assert not unexpected and not missing, (missing, unexpected)
        return rm.train()

    rng = np.random.default_rng(23)
    ids = rng.integers(2, VOCAB - 2, size=(B, CTX)).astype(np.int64)
    ids[:, 0] = 1
    for r in range(B):
        ids[r, 5 + r] = VOCAB - 1
        ids[r, 6 + r:] = 0
    mask = (ids > 0).astype(np.int64)
    mask[:, 0] = 1
    video = rng.normal(size=(B, F, 3, RES, RES)).astype(np.float32)

    title = rng.integers(2, VOCAB - 2, size=(B, CTX)).astype(np.int64)
    title[:, 0] = 1
    for r in range(B):
        title[r, 4 + r] = VOCAB - 1
        title[r, 5 + r:] = 0
    tmask = (title > 0).astype(np.int64)
    tmask[:, 0] = 1

    def ref_grads(rm, loss):
        loss.backward()
        return {n: p.grad.detach().to(torch.float64).numpy()
                for n, p in rm.named_parameters() if p.grad is not None}

    def our_grads(step_fn, batch):
        # fresh device copies: the jitted step donates its input state
        p_dev = jax.tree_util.tree_map(jnp.asarray, params0)
        state = FinetuneState.create(p_dev, optax.scale(-1.0))
        new_state, metrics = step_fn(state, batch)
        grads = jax.tree_util.tree_map(
            lambda a, b: np.asarray(a, np.float64) - np.asarray(b,
                                                                np.float64),
            params0, new_state.params)
        gpath = os.path.join(tmp, "ft_grads.bin")
        save_reference_checkpoint(gpath, grads, language="english")
        gsd = torch.load(gpath, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in gsd.items()}, metrics

    def compare_grads(tag, ours, ref32, ref64):
        _compare_grads(check, tag, ours, ref32, ref64)

    def loss_tol(ref32_loss, ref64_loss):
        # 8x for the same reduction-order reason as compare_grads; the
        # 2e-5 absolute floor covers the case where the reference's own
        # fp32-vs-f64 gap is unusually tight (measured 1.5e-6 on the
        # BirdModel step while our equally-valid reduction order lands
        # 1.2e-5 from the f64 truth — the loss sums exp(logit_scale)=100-
        # amplified softmax terms, so ~1e-5 absolute IS the fp32 envelope
        # for an O(1) scalar here; a semantic mismatch shows as >=1e-3)
        return max(8.0 * abs(float(ref32_loss) - float(ref64_loss)), 2e-5)

    f64_truth_mode = _f64_truth_mode

    # ---- BirdModel: VTM + FTM composed step (fp32 + f64 ground truth)
    rm = build_ref(rmod.BirdModel)
    ref_loss = rm(torch.tensor(ids), torch.tensor(mask),
                  torch.tensor(video), F, None, 1)
    rgrads = ref_grads(rm, ref_loss)
    with f64_truth_mode():
        rm64 = build_ref(rmod.BirdModel, torch.float64)
        ref_loss64 = rm64(torch.tensor(ids), torch.tensor(mask),
                          torch.tensor(video).double(), F, None, 1)
        rgrads64 = ref_grads(rm64, ref_loss64)
    step_fn = make_finetune_step(model, optax.scale(-1.0), cross,
                                 use_frame_fea=True)
    batch = {"query_ids": jnp.asarray(ids.astype(np.int32)),
             "query_mask": jnp.asarray(mask.astype(np.int32)),
             "video": jnp.asarray(video.transpose(0, 1, 3, 4, 2))}
    ograds, metrics = our_grads(step_fn, batch)
    check("BirdModel.forward loss (vs f64 truth, 8x ref fp32 noise, 2e-5 floor)",
          float(metrics["loss"]), float(ref_loss64),
          loss_tol(ref_loss, ref_loss64))
    compare_grads("BirdModel.forward", ograds, rgrads, rgrads64)

    # ---- BirdModel_VT: title step (weight_title repaired on both sides)
    rm_vt = build_ref(rmod.BirdModel_VT)
    rm_vt.weight_title = cross.weight_title  # undefined in the reference
    ref_loss_vt = rm_vt(torch.tensor(ids), torch.tensor(mask),
                        torch.tensor(video), F, torch.tensor(title),
                        torch.tensor(tmask), None, 1)
    rgrads_vt = ref_grads(rm_vt, ref_loss_vt)
    with f64_truth_mode():
        rm_vt64 = build_ref(rmod.BirdModel_VT, torch.float64)
        rm_vt64.weight_title = cross.weight_title
        ref_loss_vt64 = rm_vt64(torch.tensor(ids), torch.tensor(mask),
                                torch.tensor(video).double(), F,
                                torch.tensor(title), torch.tensor(tmask),
                                None, 1)
        rgrads_vt64 = ref_grads(rm_vt64, ref_loss_vt64)
    vt_step = make_finetune_vt_step(model, optax.scale(-1.0), cross)
    batch_vt = dict(batch, title_ids=jnp.asarray(title.astype(np.int32)),
                    title_mask=jnp.asarray(tmask.astype(np.int32)))
    ograds_vt, metrics_vt = our_grads(vt_step, batch_vt)
    check("BirdModel_VT.forward loss (vs f64 truth, 8x ref fp32 noise, 2e-5 floor)",
          float(metrics_vt["loss"]), float(ref_loss_vt64),
          loss_tol(ref_loss_vt, ref_loss_vt64))
    # the video tower gets NO grad from the VT loss on either side: the
    # reference's video terms are commented out (modeling.py:760-768)
    vt_visual = [n for n in rgrads_vt64 if n.startswith("visual_encoder.")]
    check("BirdModel_VT visual grads absent (reference comments the "
          "video loss out)", float(len(vt_visual)), 0.0, 0.5)
    compare_grads("BirdModel_VT.forward", ograds_vt, rgrads_vt, rgrads_vt64)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--skip-flagship", action="store_true",
                   help="skip the full ViT-B/32 geometry checks (slower)")
    args = p.parse_args()
    if not os.path.isdir(os.path.join(args.reference, "modules")):
        print(f"reference checkout not found at {args.reference}; skipping")
        return

    import torch

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hmmc_tpu import losses
    from hmmc_tpu import metrics as our_metrics
    from hmmc_tpu.config import ClipArch, CrossConfig
    from hmmc_tpu.models.retrieval import BirdModel
    from hmmc_tpu.train.orbax_io import save_reference_checkpoint

    mcross, um, rmetrics, ropt = load_reference(args.reference)

    # tiny geometry; head counts follow the reference's width//64 rule
    W, EMB, CTX, VOCAB, RES, PATCH, F, B = 64, 32, 16, 512, 32, 16, 3, 4
    arch = ClipArch(
        embed_dim=EMB, image_resolution=RES, vision_layers=2,
        vision_width=W, vision_patch_size=PATCH, context_length=CTX,
        vocab_size=VOCAB, transformer_width=W, transformer_heads=W // 64,
        transformer_layers=2)
    cross = CrossConfig(temporal_hidden_size=EMB,
                        temporal_attention_heads=2,
                        temporal_hidden_layers=2,
                        max_position_embeddings=8)

    # ---- build ours, export in reference naming
    model = BirdModel(arch, cross)
    ids0 = jnp.zeros((1, CTX), jnp.int32)
    mask0 = jnp.ones((1, CTX), jnp.int32)
    vid0 = jnp.zeros((1, F, RES, RES, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(11), ids0, mask0, vid0)["params"]
    import tempfile

    tmp = tempfile.mkdtemp()
    ours_ckpt = os.path.join(tmp, "ours.bin")
    save_reference_checkpoint(ours_ckpt, params, language="english")

    # ---- synthetic tiny CLIP checkpoint so the reference ctors build
    # (CLIP.get_config accepts a file path as pretrained_clip_name,
    # module_clip.py:419-439; architecture is derived from tensor shapes)
    sd_full = torch.load(ours_ckpt, map_location="cpu", weights_only=True)
    clip_sd = {}
    for k, v in sd_full.items():
        if k.startswith("visual_encoder.visual."):
            clip_sd[k[len("visual_encoder."):]] = v
        elif k.startswith("text_encoder.") and "chinese" not in k:
            kk = k[len("text_encoder."):]
            if kk != "logit_scale":
                clip_sd[kk] = v
    clip_sd["logit_scale"] = sd_full["text_encoder.logit_scale"]
    clip_path = os.path.join(tmp, "TinyCLIP.pt")
    torch.save(clip_sd, clip_path)

    task_ns = types.SimpleNamespace(local_rank=0, rank=0, use_temp=True,
                                    language="english",
                                    pretrained_text="unused")
    cc = mcross.CrossConfig(
        vocab_size_or_config_json_file=0)
    for k, v in dict(
            temporal_hidden_size=EMB, temporal_attention_heads=2,
            temporal_hidden_layers=2, max_position_embeddings=8,
            chinese_hidden_size=32,
            pretrained_clip_name=clip_path).items():
        setattr(cc, k, v)

    print("[reference towers with our weights]")
    ve = mcross.VisualEncoder(task_ns, cc)
    ve_sd = {k[len("visual_encoder."):]: v for k, v in sd_full.items()
             if k.startswith("visual_encoder.")}
    ve.load_state_dict(ve_sd, strict=True)
    ve = ve.float().eval()

    te = mcross.TextEncoder(task_ns, cc)
    te_sd = {k[len("text_encoder."):]: v for k, v in sd_full.items()
             if k.startswith("text_encoder.") and "logit_scale" not in k}
    te.load_state_dict(te_sd, strict=True)
    te = te.float().eval()

    rng = np.random.default_rng(5)
    ids = rng.integers(1, 400, size=(B, CTX)).astype(np.int64)
    ids[:, 0] = 1
    for r in range(B):
        ids[r, 5 + r] = VOCAB - 1
        ids[r, 6 + r:] = 0
    video = rng.normal(size=(B, F, 3, RES, RES)).astype(np.float32)

    with torch.no_grad():
        tq = te(torch.tensor(ids), torch.tensor(ids > 0))
        tv, tf = ve(torch.tensor(video), F)

    var = {"params": params}
    q = model.apply(var, jnp.asarray(ids.astype(np.int32)),
                    jnp.asarray((ids > 0).astype(np.int32)),
                    method="encode_text")
    v, f = model.apply(
        var, jnp.asarray(video.transpose(0, 1, 3, 4, 2)),
        method="encode_video")
    check("text pooled", np.asarray(q), tq.numpy())
    check("video feature", np.asarray(v), tv.numpy())
    check("frame features", np.asarray(f), tf.numpy())

    scale = jnp.minimum(jnp.exp(params["text_encoder"]["logit_scale"]),
                        100.0)
    sim_ours = losses.loose_similarity(q, v, scale)
    tscale = torch.clamp(torch.tensor(
        float(sd_full["text_encoder.logit_scale"])).exp(), max=100)
    tvn = tv / tv.norm(dim=-1, keepdim=True)
    tqn = tq / tq.norm(dim=-1, keepdim=True)
    check("loose_similarity", np.asarray(sim_ours),
          (tscale * tqn @ tvn.t()).numpy())

    print("[chinese tower through the reference's AutoModel path]")
    _check_chinese(mcross, tmp, check)

    print("[ModifiedResNet tower — reference executed with our weights]")
    check_resnet_tower(mcross, tmp, check)

    print("[losses]")
    sim = rng.normal(size=(14, 14)).astype(np.float32) * 3
    ts = torch.tensor(sim)
    check("CrossEn", float(losses.cross_en(jnp.asarray(sim))),
          float(um.CrossEn()(ts)), 1e-5)
    check("Dual_CrossEn", float(losses.dual_cross_en(jnp.asarray(sim))),
          float(um.Dual_CrossEn()(ts)), 1e-5)
    check("MILNCE", float(losses.milnce(jnp.asarray(sim), 7, 2)),
          float(um.MILNCELoss(batch_size=7, n_pair=2)(ts)), 1e-5)
    check("MaxMargin",
          float(losses.max_margin_ranking(
              jnp.asarray(sim), margin=0.1, negative_weighting=True,
              batch_size=7, n_pair=2, hard_negative_rate=0.5)),
          float(um.MaxMarginRankingLoss(
              margin=0.1, negative_weighting=1, batch_size=7, n_pair=2,
              hard_negative_rate=0.5)(ts)), 1e-5)

    print("[metrics]")
    log = logging.getLogger("cmp")
    log.addHandler(logging.NullHandler())
    log.propagate = False
    s1 = rng.normal(size=(40, 40)).astype(np.float32)
    mr = rmetrics.compute_metrics(s1)
    mo = our_metrics.compute_metrics(s1)
    for k in ("R1", "R5", "R10", "MR", "MeanR"):
        check(f"t2v {k}", mo[k], mr[k], 1e-6)
    counts = rng.integers(1, 4, size=12)
    cut = np.cumsum(counts).tolist()
    s2 = rng.normal(size=(cut[-1], 12)).astype(np.float32)
    mr2 = rmetrics.logging_rank(s2.copy(), True, [c - 1 for c in cut], log)
    mo2 = our_metrics.logging_rank(s2.copy(), True,
                                   [c - 1 for c in cut], log)
    for k in ("R1", "R5", "R10", "MR", "MeanR"):
        check(f"multi-sentence {k}", mo2[k], mr2[k], 1e-4)

    print("[BertAdam]")
    from hmmc_tpu.train.optimization import build_optimizer

    import optax

    lr, text_lr, coef_lr, wd, warm, ttot = 1e-2, 1e-3, 0.5, 0.2, 0.2, 10
    ours_p = {
        "visual_encoder": {"visual": {
            "conv1": {"kernel": rng.normal(size=(4, 6)).astype(np.float32)},
            "ln_1": {"bias": rng.normal(size=6).astype(np.float32)}}},
        "text_encoder": {"clip_text": {
            "w": rng.normal(size=(5, 5)).astype(np.float32),
            "bias": rng.normal(size=5).astype(np.float32)}},
        "head": {"kernel": rng.normal(size=(3, 3)).astype(np.float32),
                 "bias": rng.normal(size=3).astype(np.float32)},
    }
    names = {
        "visual_encoder.visual.conv1.weight":
            ("visual_encoder", "visual", "conv1", "kernel"),
        "visual_encoder.visual.ln_1.bias":
            ("visual_encoder", "visual", "ln_1", "bias"),
        "text_encoder.clip_text.w": ("text_encoder", "clip_text", "w"),
        "text_encoder.clip_text.bias":
            ("text_encoder", "clip_text", "bias"),
        "head.weight": ("head", "kernel"),
        "head.bias": ("head", "bias"),
    }

    def get(t, path):
        for k in path:
            t = t[k]
        return t

    tp = {n: torch.nn.Parameter(torch.tensor(get(ours_p, pth)))
          for n, pth in names.items()}
    no_decay = ["bias", "LayerNorm.bias", "LayerNorm.weight"]

    def nd(n):
        return any(x in n for x in no_decay)

    def sel(pred):
        return [p for n, p in tp.items() if pred(n)]

    groups = [
        {"params": sel(lambda n: not nd(n)
                       and "visual_encoder.visual." in n),
         "weight_decay": wd, "lr": lr * coef_lr},
        {"params": sel(lambda n: not nd(n) and "text_encoder." in n),
         "weight_decay": wd, "lr": text_lr},
        {"params": sel(lambda n: not nd(n)
                       and "visual_encoder.visual." not in n
                       and "text_encoder." not in n), "weight_decay": wd},
        {"params": sel(lambda n: nd(n) and "visual_encoder.visual." in n),
         "weight_decay": 0.0, "lr": lr * coef_lr},
        {"params": sel(lambda n: nd(n) and "text_encoder." in n),
         "weight_decay": 0.0, "lr": text_lr},
        {"params": sel(lambda n: nd(n)
                       and "visual_encoder.visual." not in n
                       and "text_encoder." not in n), "weight_decay": 0.0},
    ]
    opt = ropt.BertAdam(groups, lr=lr, warmup=warm,
                        schedule="warmup_cosine", b1=0.9, b2=0.98, e=1e-6,
                        t_total=ttot, weight_decay=wd, max_grad_norm=1.0)
    tx = build_optimizer(ours_p, lr=lr, text_lr=text_lr, coef_lr=coef_lr,
                         weight_decay=wd, warmup_proportion=warm,
                         t_total=ttot)
    st = tx.init(ours_p)
    worst = 0.0
    for s in range(4):
        g = np.random.default_rng(100 + s)
        grads = jax.tree_util.tree_map(
            lambda pp: g.normal(size=np.shape(pp)).astype(np.float32) * 2,
            ours_p)
        upd, st = tx.update(grads, st, ours_p)
        ours_p = optax.apply_updates(ours_p, upd)
        for n, pth in names.items():
            tp[n].grad = torch.tensor(get(grads, pth))
        torch.nn.utils.clip_grad_norm_(list(tp.values()), 1.0)
        opt.step()
        for n, pth in names.items():
            worst = max(worst, float(np.abs(
                np.asarray(get(ours_p, pth))
                - tp[n].detach().numpy()).max()))
    check("BertAdam 4-step trajectory", worst, 0.0, 3e-5)

    import modules.modeling as rmod

    print("[full BirdModel / BirdModel_VT fine-tune step — loss + grads "
          "through the reference's own forward/backward]")
    ft_geom = dict(emb=EMB, ctx=CTX, vocab=VOCAB, res=RES, frames=F,
                   batch=B, theads=2, temporal_layers=2)
    check_finetune_full(rmod, mcross, tmp, check, sd_full, clip_path,
                        model, params, cross, ft_geom)

    print("[full BirdPreTrainedModel MoCo step — executed side-by-side]")
    tiny_geom = dict(emb=32, res=32, vlayers=2, w=64, patch=16, ctx=16,
                     vocab=512, tw=64, tlayers=2, theads=2,
                     temporal_layers=2, frames=3, batch=4, K=8,
                     pad=0, cls=1, mask=509)
    check_pretrain_full(rmod, mcross, tmp, check, tiny_geom, jit=True,
                        tag="tiny")
    if not args.skip_flagship:
        print("[full MoCo step at FLAGSHIP ViT-B/32 geometry "
              "(12-layer towers, 77-ctx, 49408-vocab, patch-32, 224px)]")
        flag_geom = dict(emb=512, res=224, vlayers=12, w=768, patch=32,
                         ctx=77, vocab=49408, tw=512, tlayers=12,
                         theads=8, temporal_layers=4, frames=3, batch=2,
                         K=4, pad=49407, cls=49406, mask=49394)
        check_pretrain_full(rmod, mcross, tmp, check, flag_geom,
                            jit=False, tag="ViT-B/32")

    print(f"\n{PASS} checks passed, {FAIL} failed")
    sys.exit(1 if FAIL else 0)


if __name__ == "__main__":
    main()
