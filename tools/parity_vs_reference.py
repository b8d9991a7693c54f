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

This is the strongest parity evidence available without data: the
comparison target is the reference's executed code, not a re-derivation.

  python tools/parity_vs_reference.py [--reference /root/reference]
"""

from __future__ import annotations

import argparse
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
    # file_utils (download machinery we never exercise)
    for fake in ("boto3", "botocore", "botocore.exceptions", "tqdm"):
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reference", default="/root/reference")
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

    print(f"\n{PASS} checks passed, {FAIL} failed")
    sys.exit(1 if FAIL else 0)


if __name__ == "__main__":
    main()
