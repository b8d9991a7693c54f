"""FULL-MODEL numerical parity vs a torch composition of the reference
architecture (the strongest available proxy for R@1 parity without data):

1. A torch mirror of the reference forward — ViT per frame
   (module_clip.py:271-325 + the pooled projection of
   module_cross.py:222-230), temporal transformer with frame position
   embeddings + residual + normalize-then-mean (module_cross.py:178-216),
   CLIP text tower with EOT pooling (module_cross.py:287-305),
   loose_similarity (modeling.py:207-229) and the fine-tune loss
   (modeling.py:665-722) — is loaded with OUR weights through
   save_reference_checkpoint (strict state_dict load, so export naming is
   verified at the same time) and must agree to <=1e-4.

2. Three BertAdam steps (optimization.py:52-168 semantics: no bias
   correction, per-param clip inside the step, warmup_cosine on
   step/t_total) through the reference's 6 param groups
   (main_task_retrieval.py:171-199) must track our optax chain
   update-for-update.

The torch modules below are fresh implementations of the documented
behavior, not copies; parameter names intentionally match the reference's
checkpoint naming so load_state_dict(strict=True) doubles as an
export-format test.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from hmmc_tpu import losses
from hmmc_tpu.config import ClipArch, CrossConfig
from hmmc_tpu.models.retrieval import BirdModel

# tiny geometry (same ratios as ViT-B/32, shrunk)
W, V_LAYERS, T_LAYERS, HEADS = 64, 2, 2, 2
EMB, CTX, VOCAB = 32, 16, 512
RES, PATCH, FRAMES, B = 32, 16, 3, 4

ARCH = ClipArch(
    embed_dim=EMB, image_resolution=RES, vision_layers=V_LAYERS,
    vision_width=W, vision_patch_size=PATCH, context_length=CTX,
    vocab_size=VOCAB, transformer_width=W, transformer_heads=HEADS,
    transformer_layers=T_LAYERS)
CROSS = CrossConfig(
    temporal_hidden_size=EMB, temporal_attention_heads=HEADS,
    temporal_hidden_layers=2, max_position_embeddings=8)


# ---------------------------------------------------------------------------
# torch mirror of the reference forward
# ---------------------------------------------------------------------------

def _qgelu(x):
    # QuickGELU (module_clip.py / module_cross.py)
    return x * torch.sigmoid(1.702 * x)


class _Mlp(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.c_fc = nn.Linear(d, 4 * d)
        self.c_proj = nn.Linear(4 * d, d)

    def forward(self, x):
        return self.c_proj(_qgelu(self.c_fc(x)))


class _ResBlock(nn.Module):
    """Pre-LN residual attention block (module_clip.py
    ResidualAttentionBlock behavior). Operates in LND layout."""

    def __init__(self, d, h):
        super().__init__()
        self.attn = nn.MultiheadAttention(d, h)
        self.ln_1 = nn.LayerNorm(d)
        self.mlp = _Mlp(d)
        self.ln_2 = nn.LayerNorm(d)

    def forward(self, x, attn_mask=None):
        y = self.ln_1(x)
        y = self.attn(y, y, y, need_weights=False, attn_mask=attn_mask)[0]
        x = x + y
        return x + self.mlp(self.ln_2(x))


class _Tfm(nn.Module):
    def __init__(self, d, layers, h):
        super().__init__()
        self.resblocks = nn.ModuleList(
            [_ResBlock(d, h) for _ in range(layers)])

    def forward(self, x, attn_mask=None):
        for blk in self.resblocks:
            x = blk(x, attn_mask)
        return x


class _ViT(nn.Module):
    """Patch conv + class token + pre-LN transformer; pooled output =
    (ln_post(hidden) @ proj)[:, 0] exactly like encode_image
    (module_cross.py:222-230)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, W, PATCH, PATCH, bias=False)
        self.class_embedding = nn.Parameter(torch.zeros(W))
        grid = RES // PATCH
        self.positional_embedding = nn.Parameter(
            torch.zeros(grid * grid + 1, W))
        self.ln_pre = nn.LayerNorm(W)
        # ViT head count is DERIVED in the reference: width // 64
        # (module_clip.py build_model)
        self.transformer = _Tfm(W, V_LAYERS, ARCH.vision_heads)
        self.ln_post = nn.LayerNorm(W)
        self.proj = nn.Parameter(torch.zeros(W, EMB))

    def forward(self, x):                       # [N, 3, H, W]
        x = self.conv1(x)                       # [N, W, gh, gw]
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding[None, None, :].expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x)
        x = self.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
        hidden = self.ln_post(x) @ self.proj
        return hidden[:, 0, :]


class _VisualEncoder(nn.Module):
    """module_cross.py:178-216: per-frame ViT; + frame position
    embeddings -> temporal transformer -> residual; video feature =
    mean over frames of L2-normalized rows; frame features are the
    PRE-temporal hiddens."""

    def __init__(self):
        super().__init__()
        self.visual = _ViT()
        self.frame_position_embeddings = nn.Embedding(
            CROSS.max_position_embeddings, EMB)
        self.temporal_transformer = _Tfm(EMB, CROSS.temporal_hidden_layers,
                                         HEADS)

    def forward(self, video):                   # [B, F, 3, H, W]
        b, f = video.shape[:2]
        per = self.visual(video.reshape(b * f, *video.shape[2:]))
        hidden = per.reshape(b, f, -1)
        frame_output = hidden
        pos = self.frame_position_embeddings(torch.arange(f))
        x = (hidden + pos).permute(1, 0, 2)
        x = self.temporal_transformer(x).permute(1, 0, 2)
        hidden = x + frame_output
        normed = hidden / hidden.norm(dim=-1, keepdim=True)
        return normed.mean(dim=1), frame_output


class _TextEncoder(nn.Module):
    """CLIP text tower with causal mask + EOT(argmax ids) pooling
    (module_cross.py:287-305)."""

    def __init__(self):
        super().__init__()
        self.logit_scale = nn.Parameter(torch.zeros(()))
        self.token_embedding = nn.Embedding(VOCAB, W)
        self.positional_embedding = nn.Parameter(torch.zeros(CTX, W))
        self.transformer = _Tfm(W, T_LAYERS, HEADS)
        self.ln_final = nn.LayerNorm(W)
        self.text_projection = nn.Parameter(torch.zeros(W, EMB))

    def forward(self, ids):                     # [B, L]
        l = ids.shape[1]
        x = self.token_embedding(ids) + self.positional_embedding[:l]
        mask = torch.full((l, l), float("-inf")).triu(1)
        x = self.transformer(x.permute(1, 0, 2), mask).permute(1, 0, 2)
        hidden = self.ln_final(x) @ self.text_projection
        return hidden[torch.arange(hidden.shape[0]), ids.argmax(dim=-1)]


class _TorchBird(nn.Module):
    def __init__(self):
        super().__init__()
        self.text_encoder = _TextEncoder()
        self.visual_encoder = _VisualEncoder()

    def loose_similarity(self, q, v):           # modeling.py:207-229
        v = v / v.norm(dim=-1, keepdim=True)
        q = q / q.norm(dim=-1, keepdim=True)
        scale = torch.clamp(self.text_encoder.logit_scale.exp(), max=100)
        return scale * (q @ v.t())


def _cross_en(sim):                             # until_module.py:196-205
    return -torch.diag(torch.log_softmax(sim, dim=-1)).mean()


# ---------------------------------------------------------------------------
# forward parity
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    """(our params, torch mirror loaded with the same weights)."""
    from hmmc_tpu.train.orbax_io import save_reference_checkpoint

    model = BirdModel(ARCH, CROSS)  # fp32
    ids = jnp.zeros((1, CTX), jnp.int32)
    mask = jnp.ones((1, CTX), jnp.int32)
    video = jnp.zeros((1, FRAMES, RES, RES, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(7), ids, mask, video)["params"]
    path = str(tmp_path_factory.mktemp("parity") / "pytorch_model.bin.0")
    save_reference_checkpoint(path, params, language="english")

    mirror = _TorchBird()
    sd = torch.load(path, map_location="cpu", weights_only=True)
    mirror.load_state_dict(sd, strict=True)  # export naming must be exact
    mirror.eval()
    return model, params, mirror


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(11)
    ids = rng.integers(1, 400, size=(B, CTX)).astype(np.int64)
    ids[:, 0] = 1
    for r in range(B):
        ids[r, 5 + r] = VOCAB - 1      # unique row max = EOT position
        ids[r, 6 + r:] = 0
    video = rng.normal(size=(B, FRAMES, 3, RES, RES)).astype(np.float32)
    return ids, video


def test_full_forward_parity(pair, batch):
    model, params, mirror = pair
    ids, video = batch
    jids = jnp.asarray(ids.astype(np.int32))
    jmask = jnp.asarray((ids > 0).astype(np.int32))
    jvideo = jnp.asarray(video.transpose(0, 1, 3, 4, 2))  # NCHW -> NHWC

    var = {"params": params}
    q = np.asarray(model.apply(var, jids, jmask, method="encode_text"))
    v, f = model.apply(var, jvideo, method="encode_video")
    v, f = np.asarray(v), np.asarray(f)

    with torch.no_grad():
        tq = mirror.text_encoder(torch.tensor(ids))
        tv, tf = mirror.visual_encoder(torch.tensor(video))

    np.testing.assert_allclose(q, tq.numpy(), atol=1e-4)
    np.testing.assert_allclose(f, tf.numpy(), atol=1e-4)
    np.testing.assert_allclose(v, tv.numpy(), atol=1e-4)


def test_similarity_and_loss_parity(pair, batch):
    model, params, mirror = pair
    ids, video = batch
    jids = jnp.asarray(ids.astype(np.int32))
    jmask = jnp.asarray((ids > 0).astype(np.int32))
    jvideo = jnp.asarray(video.transpose(0, 1, 3, 4, 2))

    var = {"params": params}
    q = model.apply(var, jids, jmask, method="encode_text")
    v, f = model.apply(var, jvideo, method="encode_video")
    scale = jnp.minimum(
        jnp.exp(params["text_encoder"]["logit_scale"]), 100.0)
    sim = losses.loose_similarity(q, v, scale)
    out = losses.finetune_retrieval_loss(
        q, v, f, scale, CROSS.weight_VTM_finetune, CROSS.weight_FTM_finetune)

    with torch.no_grad():
        tq = mirror.text_encoder(torch.tensor(ids))
        tv, tf = mirror.visual_encoder(torch.tensor(video))
        tsim = mirror.loose_similarity(tq, tv)
        # fine-tune loss (modeling.py:665-709): VTM symmetric CrossEn +
        # mean-over-frames symmetric CrossEn, weights .85/.15
        sim_loss = _cross_en(tsim) + _cross_en(tsim.t())
        frame_loss = torch.zeros(())
        for i in range(FRAMES):
            m = mirror.loose_similarity(tq, tf[:, i, :])
            frame_loss = frame_loss + (_cross_en(m) + _cross_en(m.t())) / FRAMES
        tloss = (CROSS.weight_VTM_finetune * sim_loss
                 + CROSS.weight_FTM_finetune * frame_loss)

    np.testing.assert_allclose(np.asarray(sim), tsim.numpy(), atol=1e-4)
    np.testing.assert_allclose(float(out["sim_loss"]), float(sim_loss),
                               atol=1e-4)
    np.testing.assert_allclose(float(out["frame_loss"]), float(frame_loss),
                               atol=1e-4)
    np.testing.assert_allclose(float(out["loss"]), float(tloss), atol=1e-4)


# ---------------------------------------------------------------------------
# BertAdam trajectory parity (optimization.py:52-168)
# ---------------------------------------------------------------------------

def _warmup_cosine(x, warmup):
    # optimization.py:26-29 — the cosine phase ignores the warmup offset
    if x < warmup:
        return x / warmup
    return 0.5 * (1.0 + math.cos(math.pi * x))


def _ref_bert_adam_step(groups, state, lr, warmup, t_total,
                        b1=0.9, b2=0.98, eps=1e-6, max_grad_norm=1.0):
    """One reference-semantics BertAdam step over torch param groups
    (fresh implementation of the documented math of
    optimization.py:103-168)."""
    for group in groups:
        g_lr = group.get("lr", lr)
        wd = group["weight_decay"]
        for p in group["params"]:
            if p.grad is None:
                continue
            st = state.setdefault(
                id(p), {"step": 0, "m": torch.zeros_like(p),
                        "v": torch.zeros_like(p)})
            grad = p.grad.data
            if max_grad_norm > 0:
                torch.nn.utils.clip_grad_norm_([p], max_grad_norm)
            st["m"].mul_(b1).add_(grad, alpha=1 - b1)
            st["v"].mul_(b2).addcmul_(grad, grad, value=1 - b2)
            update = st["m"] / (st["v"].sqrt() + eps)
            if wd > 0:
                update = update + wd * p.data
            lr_t = g_lr * _warmup_cosine(st["step"] / t_total, warmup)
            p.data.add_(update, alpha=-lr_t)
            st["step"] += 1


def test_bert_adam_trajectory_matches_reference():
    """3 steps with group-structured params and fixed grads: our optax
    chain (global clip -> per-param clip -> no-bias-correction Adam ->
    decoupled wd -> warmup_cosine) must track the reference BertAdam
    through all 6 groups of main_task_retrieval.py:171-199."""
    from hmmc_tpu.train.optimization import build_optimizer

    rng = np.random.default_rng(3)
    lr, text_lr, coef_lr, wd = 1e-2, 1e-3, 0.5, 0.2
    warmup, t_total = 0.2, 10

    def arr(*s):
        return rng.normal(size=s).astype(np.float32)

    # leaves covering: CLIP-visual decay/no-decay, text decay/no-decay,
    # other decay/no-decay, HF LayerNorm scale (no decay via the
    # "LayerNorm.weight" substring), frozen t_projector
    ours = {
        "visual_encoder": {"visual": {"conv1": {"kernel": arr(4, 6)},
                                      "ln_1": {"bias": arr(6)}}},
        "text_encoder": {"clip_text": {"w": arr(5, 5), "bias": arr(5)},
                         "chinese_encoder": {"attn_ln": {"scale": arr(5)}}},
        "head": {"kernel": arr(3, 3), "bias": arr(3)},
        "t_projector": {"kernel": arr(2, 2)},
    }
    # torch twins with reference names driving the reference grouping
    names = {
        "visual_encoder.visual.conv1.weight":
            ("visual_encoder", "visual", "conv1", "kernel"),
        "visual_encoder.visual.ln_1.bias":
            ("visual_encoder", "visual", "ln_1", "bias"),
        "text_encoder.clip_text.w": ("text_encoder", "clip_text", "w"),
        "text_encoder.clip_text.bias": ("text_encoder", "clip_text", "bias"),
        "text_encoder.chinese_encoder.LayerNorm.weight":
            ("text_encoder", "chinese_encoder", "attn_ln", "scale"),
        "head.weight": ("head", "kernel"),
        "head.bias": ("head", "bias"),
    }

    def get(tree, path):
        for k in path:
            tree = tree[k]
        return tree

    tparams = {n: torch.nn.Parameter(torch.tensor(get(ours, p)))
               for n, p in names.items()}

    # the 6 groups (main_task_retrieval.py:176-199)
    no_decay = ["bias", "LayerNorm.bias", "LayerNorm.weight"]

    def is_nd(n):
        return any(nd in n for nd in no_decay)

    def sel(pred):
        return [p for n, p in tparams.items() if pred(n)]

    groups = [
        {"params": sel(lambda n: not is_nd(n) and
                       "visual_encoder.visual." in n),
         "weight_decay": wd, "lr": lr * coef_lr},
        {"params": sel(lambda n: not is_nd(n) and "text_encoder." in n),
         "weight_decay": wd, "lr": text_lr},
        {"params": sel(lambda n: not is_nd(n)
                       and "visual_encoder.visual." not in n
                       and "text_encoder." not in n),
         "weight_decay": wd},
        {"params": sel(lambda n: is_nd(n) and
                       "visual_encoder.visual." in n),
         "weight_decay": 0.0, "lr": lr * coef_lr},
        {"params": sel(lambda n: is_nd(n) and "text_encoder." in n),
         "weight_decay": 0.0, "lr": text_lr},
        {"params": sel(lambda n: is_nd(n)
                       and "visual_encoder.visual." not in n
                       and "text_encoder." not in n),
         "weight_decay": 0.0},
    ]

    tx = build_optimizer(ours, lr=lr, text_lr=text_lr, coef_lr=coef_lr,
                         weight_decay=wd, warmup_proportion=warmup,
                         t_total=t_total)
    opt_state = tx.init(ours)
    tstate = {}
    t_proj_init = np.array(ours["t_projector"]["kernel"])

    for step in range(3):
        g = np.random.default_rng(100 + step)
        grads = jax.tree_util.tree_map(
            lambda p: g.normal(size=np.shape(p)).astype(np.float32) * 2.0,
            ours)
        # t_projector gets NO grad in the reference (DDP
        # find_unused_parameters, BertAdam skips it) — zero here so the
        # GLOBAL clip norms match between the two sides
        grads["t_projector"]["kernel"] = np.zeros_like(
            grads["t_projector"]["kernel"])
        updates, opt_state = tx.update(grads, opt_state, ours)
        import optax

        ours = optax.apply_updates(ours, updates)

        # reference: train-loop global clip (main_task_retrieval.py:290)
        # then the optimizer step
        for n, path in names.items():
            tparams[n].grad = torch.tensor(get(grads, path))
        torch.nn.utils.clip_grad_norm_(
            [p for p in tparams.values()], 1.0)
        _ref_bert_adam_step(groups, tstate, lr, warmup, t_total)

        for n, path in names.items():
            np.testing.assert_allclose(
                get(ours, path), tparams[n].detach().numpy(),
                atol=2e-5, err_msg=f"step {step}: {n}")
    # frozen projector never moves (lr group 0, weight decay scaled by lr)
    np.testing.assert_array_equal(ours["t_projector"]["kernel"],
                                  t_proj_init)


def test_chinese_tower_matches_hf_bert():
    """Our BertEncoder vs transformers.BertModel on identical weights:
    the Chinese text tower is AutoModel.from_pretrained in the reference
    (module_cross.py:260-265), so HF IS the reference implementation here.
    Covers embeddings + token types, post-LN blocks, the additive padding
    mask, and the tanh pooler."""
    from transformers import BertConfig, BertModel

    from hmmc_tpu.models.text import BertEncoder
    from hmmc_tpu.train.checkpoint import import_hf_bert

    cfg = BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=24, hidden_act="gelu",
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0)
    hf = BertModel(cfg)
    hf.eval()

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = import_hf_bert(sd)
    enc = BertEncoder(vocab_size=64, hidden_size=32, num_layers=2,
                      num_heads=2, intermediate_size=64,
                      max_position_embeddings=24)

    rng = np.random.default_rng(5)
    ids = rng.integers(1, 64, size=(3, 10)).astype(np.int64)
    mask = np.ones((3, 10), np.int64)
    mask[0, 7:] = 0
    mask[2, 4:] = 0

    hidden, pooled = enc.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(ids.astype(np.int32)), jnp.asarray(mask))
    with torch.no_grad():
        out = hf(torch.tensor(ids), attention_mask=torch.tensor(mask))
    np.testing.assert_allclose(
        np.asarray(hidden), out.last_hidden_state.numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), atol=2e-5)


# ---------------------------------------------------------------------------
# pretrain contrast losses vs torch mirrors (modeling.py:286-332)
# ---------------------------------------------------------------------------

def _t_moco(q, k, queue, temp):
    """contrastive_loss (modeling.py:286-313): l_pos = diag(q k^T),
    l_neg = q @ queue, CE over [1+K] with target 0, temperature T."""
    q = torch.nn.functional.normalize(q, dim=1)
    k = torch.nn.functional.normalize(k, dim=1)
    l_pos = torch.diag(q @ k.T).reshape(q.shape[0], 1)
    l_neg = q @ queue
    logits = torch.cat([l_pos, l_neg], dim=1) / temp
    labels = torch.zeros(logits.shape[0], dtype=torch.long)
    return torch.nn.functional.cross_entropy(logits, labels)


def test_pretrain_contrast_losses_match_torch():
    from hmmc_tpu.losses import (frame_cross_loss, frame_self_loss,
                                 moco_contrastive)

    rng = np.random.default_rng(9)
    Bq, F_, H, K, temp = 6, 4, 16, 12, 0.07
    frame = rng.normal(size=(Bq, F_, H)).astype(np.float32)
    frame_k = rng.normal(size=(Bq, F_, H)).astype(np.float32)
    text = rng.normal(size=(Bq, H)).astype(np.float32)
    text_k = rng.normal(size=(Bq, H)).astype(np.float32)
    qf = rng.normal(size=(H, K)).astype(np.float32)
    qf /= np.linalg.norm(qf, axis=0, keepdims=True)
    qt = rng.normal(size=(H, K)).astype(np.float32)
    qt /= np.linalg.norm(qt, axis=0, keepdims=True)

    # moco_contrastive == contrastive_loss
    ours = float(moco_contrastive(
        jnp.asarray(text), jnp.asarray(text_k), jnp.asarray(qt), temp))
    ref = float(_t_moco(torch.tensor(text), torch.tensor(text_k),
                        torch.tensor(qt), temp))
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    # frame_self_loss == FAM (modeling.py:315-323): adjacent pairs,
    # both directions, averaged over F-1
    ours = float(frame_self_loss(
        jnp.asarray(frame), jnp.asarray(frame_k), jnp.asarray(qf), temp))
    tf, tfk = torch.tensor(frame), torch.tensor(frame_k)
    ref = sum(_t_moco(tf[:, i], tfk[:, i + 1], torch.tensor(qf), temp)
              + _t_moco(tf[:, i + 1], tfk[:, i], torch.tensor(qf), temp)
              for i in range(F_ - 1)) / (F_ - 1)
    np.testing.assert_allclose(ours, float(ref), atol=1e-5)

    # frame_cross_loss == FTM (modeling.py:325-332): per frame,
    # text-vs-frame_k + frame-vs-text_k, averaged over F
    ours = float(frame_cross_loss(
        jnp.asarray(frame), jnp.asarray(frame_k), jnp.asarray(qf),
        jnp.asarray(text), jnp.asarray(text_k), jnp.asarray(qt), temp))
    tt, ttk = torch.tensor(text), torch.tensor(text_k)
    ref = sum(_t_moco(tt, tfk[:, i], torch.tensor(qf), temp)
              + _t_moco(tf[:, i], ttk, torch.tensor(qt), temp)
              for i in range(F_)) / F_
    np.testing.assert_allclose(ours, float(ref), atol=1e-5)
