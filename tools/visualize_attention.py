"""Qualitative attention-map visualization for a (video, query) pair.

Produces the reference paper's qualitative figures (README.md:177-181,
pics/visual_attention1.png — the reference publishes the images but ships
no code for them): per-frame ViT patch heatmaps showing WHERE each frame's
feature looks, temporal-transformer weights showing WHICH frames the video
feature attends to, per-frame query similarities (the FTM signal that
drives --top_frames), and the text tower's token relevance for the query.

Attention probabilities are captured by the towers' ``sow_attn`` switch
(flax 'intermediates'; zero cost when off) and aggregated with attention
rollout (Abnar & Zuidema 2020): per layer, average heads, add the residual
identity, row-normalize, and chain-multiply across layers.

  python tools/visualize_attention.py \\
      --clip_model /ckpts/ViT-B-32.pt --init_model out/ft/ckpt.bin \\
      --framepack /data/msrvtt/frames.fpk --video_id video7010 \\
      --query "a man is cooking pasta" --max_frames 12 --output_dir out/viz

Inputs: ``--framepack`` + ``--video_id`` (a FramePack store), or
``--frames_dir`` (a directory of jpg/png frames, sorted by name).
Outputs in --output_dir: ``frame_XX.png`` (the model-input frame),
``frame_XX_attn.png`` (rollout heatmap overlay), ``summary.json``
(temporal weights, frame similarities, token relevances).

ViT towers only (the ResNet towers have no patch attention to roll out;
their single AttentionPool layer is not a comparable map). Token-level
text relevance is english/CLIP-tower only.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# aggregation math (pure numpy — unit-tested in tests/test_attention_viz.py)
# ---------------------------------------------------------------------------

def attention_rollout(weights: np.ndarray) -> np.ndarray:
    """[layers, B, H, L, L] softmax probabilities -> [B, L, L] rollout.

    Per layer: head-mean, add I (the residual path), row-normalize; the
    rollout is the product over layers (later layers applied on the left),
    so row q of the result distributes token q's final representation over
    the INPUT tokens.
    """
    layers, b, h, l, _ = weights.shape
    eye = np.eye(l, dtype=np.float64)
    rollout = np.broadcast_to(eye, (b, l, l)).copy()
    for layer in range(layers):
        a = weights[layer].mean(axis=1).astype(np.float64)  # [B, L, L]
        a = a + eye
        a = a / a.sum(axis=-1, keepdims=True)
        rollout = a @ rollout
    return rollout


def cls_patch_scores(rollout: np.ndarray, grid: int) -> np.ndarray:
    """[B, L, L] rollout (token 0 = CLS) -> [B, grid, grid] patch scores,
    min-max normalized to [0, 1] per image."""
    scores = rollout[:, 0, 1:]                              # [B, L-1]
    b = scores.shape[0]
    scores = scores.reshape(b, grid, grid)
    lo = scores.min(axis=(1, 2), keepdims=True)
    hi = scores.max(axis=(1, 2), keepdims=True)
    return ((scores - lo) / np.maximum(hi - lo, 1e-12)).astype(np.float32)


def temporal_frame_weights(weights: np.ndarray) -> np.ndarray:
    """Temporal-transformer probabilities [layers, B, H, F, F] -> [B, F]:
    how much the (mean-pooled) video feature attends to each frame.

    The video feature is the mean over frames (module_cross.py:210-212),
    so the per-frame weight is the column-mean of the rollout — the
    average share each input frame contributes to the output frames."""
    rollout = attention_rollout(weights)                    # [B, F, F]
    w = rollout.mean(axis=1)                                # [B, F]
    return (w / w.sum(axis=-1, keepdims=True)).astype(np.float32)


def token_relevance(weights: np.ndarray, ids: np.ndarray,
                    eot_id: int = 49407) -> np.ndarray:
    """Causal text-tower probabilities [layers, B, H, L, L] + ids [B, L] ->
    [B, L]: the EOT (pooled) token's rollout row, zeroed at padding."""
    rollout = attention_rollout(weights)                    # [B, L, L]
    eot = ids.argmax(axis=-1)                               # reference EOT loc
    rows = rollout[np.arange(ids.shape[0]), eot]            # [B, L]
    rows = rows * (ids > 0)
    s = rows.sum(axis=-1, keepdims=True)
    return (rows / np.maximum(s, 1e-12)).astype(np.float32)


# ---------------------------------------------------------------------------
# rendering (PIL only — no matplotlib in the image)
# ---------------------------------------------------------------------------

# compact turbo-like anchor ramp (dark blue -> cyan -> yellow -> red)
_RAMP = np.array([
    [48, 18, 59], [70, 107, 227], [40, 187, 236], [42, 235, 169],
    [139, 252, 78], [223, 220, 55], [253, 149, 39], [227, 68, 10],
    [122, 4, 3]], dtype=np.float32)


def colorize(scores01: np.ndarray) -> np.ndarray:
    """[H, W] in [0,1] -> [H, W, 3] uint8 through the turbo-like ramp."""
    x = np.clip(scores01, 0.0, 1.0) * (len(_RAMP) - 1)
    i = np.minimum(x.astype(np.int32), len(_RAMP) - 2)
    frac = (x - i)[..., None]
    rgb = _RAMP[i] * (1.0 - frac) + _RAMP[i + 1] * frac
    return rgb.astype(np.uint8)


def overlay_heatmap(frame: np.ndarray, patch_scores: np.ndarray,
                    alpha: float = 0.45) -> np.ndarray:
    """frame [H, W, 3] uint8 + patch scores [g, g] in [0,1] -> blended
    uint8 image (bilinear heatmap upsample via PIL)."""
    from PIL import Image

    h, w = frame.shape[:2]
    heat = Image.fromarray((np.clip(patch_scores, 0, 1) * 255).astype(
        np.uint8), mode="L").resize((w, h), Image.BILINEAR)
    heat01 = np.asarray(heat, np.float32) / 255.0
    color = colorize(heat01).astype(np.float32)
    out = (1.0 - alpha) * frame.astype(np.float32) + alpha * color
    return np.clip(out, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# capture + composition
# ---------------------------------------------------------------------------

def _sown(inter, *path):
    node = inter
    for key in path:
        node = node[key]
    return np.asarray(node["attn_weights"][0], np.float32)


def visualize(arch, cross, task, params, frames_uint8: np.ndarray,
              query_ids: np.ndarray, query_mask: np.ndarray,
              output_dir: str, tokens=None) -> dict:
    """Core, testable path. frames_uint8: [F, H, W, 3] (model resolution,
    pre-normalization); query_ids/mask: [L]. Writes PNGs + summary.json
    into output_dir and returns the summary dict."""
    import jax.numpy as jnp
    from PIL import Image

    from hmmc_tpu.models.text import TextEncoder
    from hmmc_tpu.models.visual import VisualEncoder
    from hmmc_tpu.ops.image_ops import normalize, to_float

    if arch.is_resnet:
        raise SystemExit("attention visualization requires a ViT tower "
                         "(the ResNet towers have no patch attention)")

    os.makedirs(output_dir, exist_ok=True)
    f = frames_uint8.shape[0]
    video = normalize(to_float(jnp.asarray(frames_uint8)))[None]  # [1,F,H,W,3]

    import jax

    venc = VisualEncoder(arch, cross, use_temp=task.use_temp,
                         dtype=jnp.float32, sow_attn=True)
    (_, frame_fea), vstate = jax.jit(
        lambda p, v: venc.apply({"params": p}, v,
                                mutable=["intermediates"]))(
        params["visual_encoder"], video)
    vinter = vstate["intermediates"]
    vit_w = _sown(vinter, "visual", "transformer", "resblocks", "block",
                  "attn")                                   # [Lyr, F, H, L, L]

    tenc = TextEncoder(arch, cross, language=task.language,
                       dtype=jnp.float32, sow_attn=True,
                       chinese_vocab_size=getattr(
                           task, "chinese_vocab_size", 21128))
    ids = jnp.asarray(query_ids)[None]
    mask = jnp.asarray(query_mask)[None]
    pooled, tstate = jax.jit(
        lambda p, i, m: tenc.apply({"params": p}, i, m,
                                   mutable=["intermediates"]))(
        params["text_encoder"], ids, mask)
    query_fea = np.asarray(pooled, np.float32)              # [1, D]

    # per-frame query similarity (the FTM/--top_frames signal,
    # main_task_retrieval.py:332-336): cosine(query, frame)
    ff = np.asarray(frame_fea, np.float32)[0]               # [F, D]
    ff = ff / np.linalg.norm(ff, axis=-1, keepdims=True)
    q = query_fea[0] / np.linalg.norm(query_fea[0])
    frame_sims = (ff @ q).tolist()

    # spatial: rollout per frame, CLS row -> patch grid
    rollout = attention_rollout(vit_w)
    heat = cls_patch_scores(rollout, arch.grid_size)        # [F, g, g]
    for i in range(f):
        Image.fromarray(frames_uint8[i]).save(
            os.path.join(output_dir, f"frame_{i:02d}.png"))
        Image.fromarray(overlay_heatmap(frames_uint8[i], heat[i])).save(
            os.path.join(output_dir, f"frame_{i:02d}_attn.png"))

    summary = {
        "num_frames": f,
        "grid_size": int(arch.grid_size),
        "frame_query_cosine": frame_sims,
        "best_frame": int(np.argmax(frame_sims)),
    }

    if task.use_temp:
        temp_w = _sown(vinter, "temporal_transformer", "resblocks",
                       "block", "attn")                     # [Lyr, 1, H, F, F]
        summary["temporal_frame_weights"] = (
            temporal_frame_weights(temp_w)[0].tolist())

    if task.language == "english":
        text_w = _sown(tstate["intermediates"], "clip_text", "transformer",
                       "resblocks", "block", "attn")
        rel = token_relevance(text_w, np.asarray(ids))[0]
        n = int(np.asarray(query_mask).sum())
        summary["token_relevance"] = rel[:n].tolist()
        if tokens is not None:
            summary["tokens"] = list(tokens)[:n]

    with open(os.path.join(output_dir, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    return summary


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def _load_frames(args) -> np.ndarray:
    """-> [F, res, res, 3] uint8 through the eval preprocessing path
    (PIL bicubic resize + center crop, parity with the eval loaders)."""
    from hmmc_tpu.data.datasets import _decode_eval

    res = args.resolution
    if args.frames_dir:
        names = sorted(
            n for n in os.listdir(args.frames_dir)
            if n.lower().endswith((".jpg", ".jpeg", ".png")))
        if not names:
            raise SystemExit(f"no image files in {args.frames_dir}")
        names = names[:args.max_frames]
        blobs = []
        for n in names:
            with open(os.path.join(args.frames_dir, n), "rb") as fh:
                blobs.append(fh.read())
    else:
        from hmmc_tpu.data.framepack import open_frame_store

        store = open_frame_store(args.framepack)
        total = store.num_frames(args.video_id)
        take = min(args.max_frames, total)
        idx = np.linspace(0, total - 1, take).astype(int).tolist()
        blobs = store.get_frames(args.video_id, idx)
    return np.stack([_decode_eval(b, res) for b in blobs])


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--query", required=True)
    p.add_argument("--frames_dir", default=None)
    p.add_argument("--framepack", default=None)
    p.add_argument("--video_id", default=None)
    p.add_argument("--clip_model", default=None,
                   help="OpenAI CLIP checkpoint (ViT-*.pt)")
    p.add_argument("--init_model", default=None,
                   help="trained HMMC checkpoint (torch .bin or Orbax dir)")
    p.add_argument("--pretrained_text", default=None,
                   help="local HF RoBERTa dir (chinese)")
    p.add_argument("--language", default="english",
                   choices=["english", "chinese"])
    p.add_argument("--use_temp", action="store_true", default=True)
    p.add_argument("--no_temp", dest="use_temp", action="store_false")
    p.add_argument("--max_frames", type=int, default=12)
    p.add_argument("--max_words", type=int, default=32)
    p.add_argument("--resolution", type=int, default=224)
    p.add_argument("--output_dir", required=True)
    args = p.parse_args()
    if bool(args.frames_dir) == bool(args.framepack):
        raise SystemExit("pass exactly one of --frames_dir / --framepack")
    if args.framepack and not args.video_id:
        raise SystemExit("--framepack requires --video_id")

    frames = _load_frames(args)

    from hmmc_tpu.cli import make_tokenizer
    from hmmc_tpu.config import CrossConfig, TaskConfig
    from hmmc_tpu.data.text import encode_text
    from hmmc_tpu.factory import build_model

    task_kw = {}
    if args.pretrained_text:
        task_kw["pretrained_text"] = args.pretrained_text
    task = TaskConfig(do_eval=True, dataset="msrvtt",
                      language=args.language, use_temp=args.use_temp,
                      max_frames=args.max_frames, **task_kw)
    cross = CrossConfig()
    tokenizer = make_tokenizer(task)
    ids, mask = encode_text(tokenizer, args.query, args.max_words,
                            args.language)
    # token labels aligned with ids (same CLS/truncate/SEP scheme as
    # encode_text)
    from hmmc_tpu.data.text import EN_SPECIALS, ZH_SPECIALS

    sp = EN_SPECIALS if args.language == "english" else ZH_SPECIALS
    tokens = [sp["cls"]] + tokenizer.tokenize(args.query)
    tokens = tokens[:args.max_words - 1] + [sp["sep"]]

    model, variables = build_model(
        task, cross, vocab_size=tokenizer.vocab_size,
        clip_model_path=args.clip_model, init_model_path=args.init_model)

    summary = visualize(model.arch, cross, task, variables["params"],
                        frames, ids, mask, args.output_dir, tokens=tokens)
    print(json.dumps({"output_dir": args.output_dir,
                      "best_frame": summary["best_frame"],
                      "num_frames": summary["num_frames"]}))


if __name__ == "__main__":
    main()
