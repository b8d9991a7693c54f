"""Checkpoint import/export.

Three checkpoint families, as in the reference:

1. **OpenAI CLIP** ``ViT-B-32.pt`` (TorchScript archive or plain state
   dict, module_clip.py:418-439): seeds the visual tower and English text
   tower. :func:`import_clip_weights`.
2. **HMMC checkpoints** ``pytorch_model.bin.N`` saved by the reference
   trainer (main_task_retrieval.py:215-222) with the deep-copied module
   naming of module_cross.py:158-176,249-256: full fine-tune/pretrain
   state. :func:`import_hmmc_state_dict` (includes the reference's
   gamma/beta → weight/bias remap, until_module.py:104-118, and
   missing/unexpected key reporting, until_module.py:148-158).
3. **Native Orbax checkpoints** for training state (see
   :class:`CheckpointManager`), which the reference lacks (it saves model
   weights only and restarts schedules on resume — SURVEY §5); ours carry
   params, optimizer state, MoCo queues, and step.

Torch tensors are converted eagerly to numpy; torch is a host-side
dependency only.

Layout conventions (import transposes, noted per mapping):
- torch Linear weight [out, in]  -> our kernel [in, out]
- torch in_proj_weight [3D, D]   -> our in_proj_kernel [D, 3D]
- torch Conv2d weight [O,I,H,W]  -> flax conv kernel [H,W,I,O]
- per-layer tensors              -> stacked along a leading [layers] axis
  (nn.scan layout)
"""

from __future__ import annotations

import logging
import re
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

Array = np.ndarray
StateDict = Dict[str, Array]


# --------------------------------------------------------------------------
# loading torch files
# --------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> StateDict:
    """Load a torch checkpoint (TorchScript archive or pickled state dict)
    into numpy arrays. Mirrors CLIP.get_config's dual loading
    (module_clip.py:432-439)."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    out: StateDict = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().to(torch.float32).cpu().numpy()
        else:
            out[k] = np.asarray(v)
    return out


def remap_gamma_beta(sd: StateDict) -> StateDict:
    """gamma->weight, beta->bias key remap (until_module.py:104-118)."""
    out = {}
    for k, v in sd.items():
        nk = k.replace("gamma", "weight").replace("beta", "bias")
        out[nk] = v
    return out


# --------------------------------------------------------------------------
# low-level converters
# --------------------------------------------------------------------------

def _lin(sd: StateDict, name: str) -> Dict[str, Array]:
    """torch Linear -> {kernel, bias}."""
    p = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _ln(sd: StateDict, name: str) -> Dict[str, Array]:
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _stack(tensors: List[Array]) -> Array:
    return np.stack(tensors, axis=0)


def _import_resblocks(sd: StateDict, prefix: str, layers: int) -> Dict:
    """torch `{prefix}.resblocks.{i}.*` -> scan-stacked block params."""
    def per_layer(fn: Callable[[int], Array]) -> Array:
        return _stack([fn(i) for i in range(layers)])

    p = prefix
    block = {
        "attn": {
            "in_proj_kernel": per_layer(
                lambda i: np.ascontiguousarray(
                    sd[f"{p}.resblocks.{i}.attn.in_proj_weight"].T)),
            "in_proj_bias": per_layer(
                lambda i: sd[f"{p}.resblocks.{i}.attn.in_proj_bias"]),
            "out_kernel": per_layer(
                lambda i: np.ascontiguousarray(
                    sd[f"{p}.resblocks.{i}.attn.out_proj.weight"].T)),
            "out_bias": per_layer(
                lambda i: sd[f"{p}.resblocks.{i}.attn.out_proj.bias"]),
        },
        "ln_1": {
            "scale": per_layer(lambda i: sd[f"{p}.resblocks.{i}.ln_1.weight"]),
            "bias": per_layer(lambda i: sd[f"{p}.resblocks.{i}.ln_1.bias"]),
        },
        "ln_2": {
            "scale": per_layer(lambda i: sd[f"{p}.resblocks.{i}.ln_2.weight"]),
            "bias": per_layer(lambda i: sd[f"{p}.resblocks.{i}.ln_2.bias"]),
        },
        "c_fc": {
            "kernel": per_layer(lambda i: np.ascontiguousarray(
                sd[f"{p}.resblocks.{i}.mlp.c_fc.weight"].T)),
            "bias": per_layer(lambda i: sd[f"{p}.resblocks.{i}.mlp.c_fc.bias"]),
        },
        "c_proj": {
            "kernel": per_layer(lambda i: np.ascontiguousarray(
                sd[f"{p}.resblocks.{i}.mlp.c_proj.weight"].T)),
            "bias": per_layer(
                lambda i: sd[f"{p}.resblocks.{i}.mlp.c_proj.bias"]),
        },
    }
    return {"resblocks": {"block": block}}


def _count_layers(sd: StateDict, prefix: str) -> int:
    pat = re.compile(re.escape(prefix) + r"\.resblocks\.(\d+)\.")
    idx = {int(m.group(1)) for k in sd if (m := pat.match(k))}
    return max(idx) + 1 if idx else 0


# --------------------------------------------------------------------------
# CLIP tower import (OpenAI checkpoint names)
# --------------------------------------------------------------------------

def import_clip_visual(sd: StateDict, prefix: str = "visual",
                       inflate_3d: bool = False) -> Dict:
    """-> VisionTransformer params (module name 'visual').

    If inflate_3d, the 2d patch conv is inflated to the 3d tube conv by
    centering the 2d kernel on the middle temporal tap (the CLIP4Clip-style
    init for linear_patch='3d')."""
    layers = _count_layers(sd, f"{prefix}.transformer")
    conv_w = sd[f"{prefix}.conv1.weight"]  # [O, I, kh, kw]
    params: Dict[str, Any] = {
        "class_embedding": sd[f"{prefix}.class_embedding"],
        "positional_embedding": sd[f"{prefix}.positional_embedding"],
        "proj": sd[f"{prefix}.proj"],
        "ln_pre": _ln(sd, f"{prefix}.ln_pre"),
        "ln_post": _ln(sd, f"{prefix}.ln_post"),
        "transformer": _import_resblocks(sd, f"{prefix}.transformer", layers),
    }
    if inflate_3d:
        o, i, kh, kw = conv_w.shape
        tube = np.zeros((o, i, 3, kh, kw), dtype=conv_w.dtype)
        tube[:, :, 1] = conv_w  # center tap
        # flax Conv kernel for 3d: [kt, kh, kw, I, O]
        params["conv2"] = {
            "kernel": np.ascontiguousarray(tube.transpose(2, 3, 4, 1, 0))}
    else:
        params["conv1"] = {
            "kernel": np.ascontiguousarray(conv_w.transpose(2, 3, 1, 0))}
    return params


def import_clip_text(sd: StateDict) -> Dict:
    """-> ClipTextTower params (module name 'clip_text')."""
    layers = _count_layers(sd, "transformer")
    return {
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "text_projection": sd["text_projection"],
        "ln_final": _ln(sd, "ln_final"),
        "transformer": _import_resblocks(sd, "transformer", layers),
    }


def _bn(sub: StateDict, name: str) -> Tuple[Dict, Dict]:
    """torch BatchNorm -> (flax params, flax batch_stats). The torch
    ``num_batches_tracked`` counter has no flax equivalent and is ignored
    on import (re-emitted as 0 on export)."""
    params = {"scale": sub[f"{name}.weight"], "bias": sub[f"{name}.bias"]}
    stats = {"mean": sub[f"{name}.running_mean"],
             "var": sub[f"{name}.running_var"]}
    return params, stats


def _conv_nhwc(sub: StateDict, name: str) -> Dict:
    # torch [O, I, kh, kw] -> flax [kh, kw, I, O]
    return {"kernel": np.ascontiguousarray(
        sub[f"{name}.weight"].transpose(2, 3, 1, 0))}


def resnet_stage_blocks(sd: StateDict, prefix: str = "visual"
                        ) -> Tuple[int, ...]:
    """Block count per stage from the key names, exactly the reference's
    sniff (module_clip.py:541-542)."""
    return tuple(
        len({k.split(".")[2] for k in sd
             if k.startswith(f"{prefix}.layer{b}")}) for b in (1, 2, 3, 4))


def import_clip_resnet(sd: StateDict, prefix: str = "visual"
                       ) -> Tuple[Dict, Dict]:
    """OpenAI CLIP ModifiedResNet state dict -> (params, batch_stats) for
    models.resnet.ModifiedResNet (reference tower: module_clip.py:159-214;
    shape-driven build: module_clip.py:536-549). Conv kernels transpose to
    NHWC; BN running stats land in the flax batch_stats collection."""
    sub = {k[len(prefix) + 1:]: v for k, v in sd.items()
           if k.startswith(prefix + ".")}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    # 3-conv stem
    for i in (1, 2, 3):
        params[f"conv{i}"] = _conv_nhwc(sub, f"conv{i}")
        params[f"bn{i}"], stats[f"bn{i}"] = _bn(sub, f"bn{i}")
    # bottleneck stages: torch "layer{s}.{b}." -> flax "layer{s}_{b}"
    for s, blocks in enumerate(resnet_stage_blocks(sd, prefix), start=1):
        for b in range(blocks):
            t = f"layer{s}.{b}"
            f = f"layer{s}_{b}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for i in (1, 2, 3):
                bp[f"conv{i}"] = _conv_nhwc(sub, f"{t}.conv{i}")
                bp[f"bn{i}"], bs[f"bn{i}"] = _bn(sub, f"{t}.bn{i}")
            if f"{t}.downsample.0.weight" in sub:
                bp["downsample_conv"] = _conv_nhwc(sub, f"{t}.downsample.0")
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    sub, f"{t}.downsample.1")
            params[f] = bp
            stats[f] = bs
    # attention pool (module_clip.py:115-156)
    ap: Dict[str, Any] = {
        "positional_embedding": sub["attnpool.positional_embedding"]}
    for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
        ap[proj] = _lin(sub, f"attnpool.{proj}")
    params["attnpool"] = ap
    return params, stats


def export_clip_resnet(params: Dict, stats: Dict,
                       out: Optional[StateDict] = None,
                       prefix: str = "visual.") -> StateDict:
    """Inverse of :func:`import_clip_resnet` — emits the OpenAI CLIP RN
    naming, including zeroed ``num_batches_tracked`` counters (flax BN
    keeps no step counter)."""
    sd: StateDict = {} if out is None else out

    def put_conv(flax_tree: Dict, name: str) -> None:
        sd[f"{name}.weight"] = np.ascontiguousarray(
            np.asarray(flax_tree["kernel"]).transpose(3, 2, 0, 1))

    def put_bn(p: Dict, s: Dict, name: str) -> None:
        sd[f"{name}.weight"] = np.asarray(p["scale"])
        sd[f"{name}.bias"] = np.asarray(p["bias"])
        sd[f"{name}.running_mean"] = np.asarray(s["mean"])
        sd[f"{name}.running_var"] = np.asarray(s["var"])
        sd[f"{name}.num_batches_tracked"] = np.zeros((), np.int64)

    for i in (1, 2, 3):
        put_conv(params[f"conv{i}"], f"{prefix}conv{i}")
        put_bn(params[f"bn{i}"], stats[f"bn{i}"], f"{prefix}bn{i}")
    for f in sorted(k for k in params if k.startswith("layer")):
        s, b = f[len("layer"):].split("_")
        t = f"{prefix}layer{s}.{b}"
        bp, bs = params[f], stats[f]
        for i in (1, 2, 3):
            put_conv(bp[f"conv{i}"], f"{t}.conv{i}")
            put_bn(bp[f"bn{i}"], bs[f"bn{i}"], f"{t}.bn{i}")
        if "downsample_conv" in bp:
            put_conv(bp["downsample_conv"], f"{t}.downsample.0")
            put_bn(bp["downsample_bn"], bs["downsample_bn"],
                   f"{t}.downsample.1")
    ap = params["attnpool"]
    sd[f"{prefix}attnpool.positional_embedding"] = np.asarray(
        ap["positional_embedding"])
    for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
        sd[f"{prefix}attnpool.{proj}.weight"] = np.ascontiguousarray(
            np.asarray(ap[proj]["kernel"]).T)
        sd[f"{prefix}attnpool.{proj}.bias"] = np.asarray(ap[proj]["bias"])
    return sd


def import_clip_weights(sd: StateDict, inflate_3d: bool = False
                        ) -> Tuple[Dict, Dict, Array, Dict]:
    """OpenAI CLIP state dict ->
    (visual_params, text_params, logit_scale, visual_batch_stats).

    Dispatches ViT vs ModifiedResNet on ``"visual.proj" in sd`` like the
    reference's shape-driven build (module_clip.py:531). visual_batch_stats
    is empty for ViT towers (no BN)."""
    if "visual.proj" in sd:
        visual = import_clip_visual(sd, "visual", inflate_3d=inflate_3d)
        visual_stats: Dict = {}
    else:
        visual, visual_stats = import_clip_resnet(sd, "visual")
    text = import_clip_text(sd)
    return (visual, text, np.asarray(sd["logit_scale"], dtype=np.float32),
            visual_stats)


# --------------------------------------------------------------------------
# HF BERT (chinese tower) import
# --------------------------------------------------------------------------

def import_hf_bert(sd: StateDict, prefix: str = "") -> Dict:
    """HF BertModel state dict -> BertEncoder params
    (module name 'chinese_encoder')."""
    p = prefix
    if p and not p.endswith("."):
        p += "."
    # some HF dumps prefix everything with 'bert.'
    if not any(k.startswith(f"{p}embeddings.") for k in sd):
        p += "bert."
    layer_idx = {
        int(m.group(1))
        for k in sd
        if (m := re.match(re.escape(p) + r"encoder\.layer\.(\d+)\.", k))
    }
    layers = max(layer_idx) + 1

    def qkv_kernel(i: int) -> Array:
        q = sd[f"{p}encoder.layer.{i}.attention.self.query.weight"].T
        k = sd[f"{p}encoder.layer.{i}.attention.self.key.weight"].T
        v = sd[f"{p}encoder.layer.{i}.attention.self.value.weight"].T
        return np.ascontiguousarray(np.concatenate([q, k, v], axis=1))

    def qkv_bias(i: int) -> Array:
        return np.concatenate([
            sd[f"{p}encoder.layer.{i}.attention.self.query.bias"],
            sd[f"{p}encoder.layer.{i}.attention.self.key.bias"],
            sd[f"{p}encoder.layer.{i}.attention.self.value.bias"]])

    block = {
        "attn": {
            "in_proj_kernel": _stack([qkv_kernel(i) for i in range(layers)]),
            "in_proj_bias": _stack([qkv_bias(i) for i in range(layers)]),
            "out_kernel": _stack([
                np.ascontiguousarray(
                    sd[f"{p}encoder.layer.{i}.attention.output.dense.weight"].T)
                for i in range(layers)]),
            "out_bias": _stack([
                sd[f"{p}encoder.layer.{i}.attention.output.dense.bias"]
                for i in range(layers)]),
        },
        "attn_ln": {
            "scale": _stack([
                sd[f"{p}encoder.layer.{i}.attention.output.LayerNorm.weight"]
                for i in range(layers)]),
            "bias": _stack([
                sd[f"{p}encoder.layer.{i}.attention.output.LayerNorm.bias"]
                for i in range(layers)]),
        },
        "intermediate": {
            "kernel": _stack([
                np.ascontiguousarray(
                    sd[f"{p}encoder.layer.{i}.intermediate.dense.weight"].T)
                for i in range(layers)]),
            "bias": _stack([
                sd[f"{p}encoder.layer.{i}.intermediate.dense.bias"]
                for i in range(layers)]),
        },
        "output": {
            "kernel": _stack([
                np.ascontiguousarray(
                    sd[f"{p}encoder.layer.{i}.output.dense.weight"].T)
                for i in range(layers)]),
            "bias": _stack([
                sd[f"{p}encoder.layer.{i}.output.dense.bias"]
                for i in range(layers)]),
        },
        "output_ln": {
            "scale": _stack([
                sd[f"{p}encoder.layer.{i}.output.LayerNorm.weight"]
                for i in range(layers)]),
            "bias": _stack([
                sd[f"{p}encoder.layer.{i}.output.LayerNorm.bias"]
                for i in range(layers)]),
        },
    }
    return {
        "word_embeddings": sd[f"{p}embeddings.word_embeddings.weight"],
        "position_embeddings": sd[f"{p}embeddings.position_embeddings.weight"],
        "token_type_embeddings":
            sd[f"{p}embeddings.token_type_embeddings.weight"],
        "embeddings_ln": {
            "scale": sd[f"{p}embeddings.LayerNorm.weight"],
            "bias": sd[f"{p}embeddings.LayerNorm.bias"],
        },
        "layer": block,
        "pooler": _lin(sd, f"{p}pooler.dense"),
    }


# --------------------------------------------------------------------------
# HMMC checkpoint (pytorch_model.bin.N) import
# --------------------------------------------------------------------------

def _import_text_encoder(sd: StateDict, prefix: str, language: str) -> Dict:
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params: Dict[str, Any] = {}
    if "logit_scale" in sub:
        params["logit_scale"] = np.asarray(sub["logit_scale"], np.float32)
    if language == "english":
        params["clip_text"] = import_clip_text(sub)
    else:
        params["chinese_encoder"] = import_hf_bert(sub, "chinese_encoder")
        params["text_proj"] = _lin(sub, "text_proj")
    return params


def _import_visual_encoder(sd: StateDict, prefix: str,
                           use_temp: bool,
                           out_stats: Optional[Dict] = None) -> Dict:
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    if "visual.proj" not in sub and "visual.attnpool.positional_embedding" \
            in sub:
        # ModifiedResNet tower inside a full HMMC checkpoint
        visual, vstats = import_clip_resnet(sub, "visual")
        if out_stats is not None:
            out_stats["visual"] = vstats
        params = {"visual": visual}
        if use_temp and "frame_position_embeddings.weight" in sub:
            params["frame_position_embeddings"] = (
                sub["frame_position_embeddings.weight"])
            layers = _count_layers(sub, "temporal_transformer")
            params["temporal_transformer"] = _import_resblocks(
                sub, "temporal_transformer", layers)
        return params
    inflate = "visual.conv2.weight" in sub
    params = {
        "visual": import_clip_visual(sub, "visual", inflate_3d=False)}
    if inflate:
        w = sub["visual.conv2.weight"]  # [O, I, kt, kh, kw]
        params["visual"]["conv2"] = {
            "kernel": np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))}
        params["visual"].pop("conv1", None)
    if use_temp and "frame_position_embeddings.weight" in sub:
        params["frame_position_embeddings"] = (
            sub["frame_position_embeddings.weight"])
        layers = _count_layers(sub, "temporal_transformer")
        params["temporal_transformer"] = _import_resblocks(
            sub, "temporal_transformer", layers)
    return params


def _import_mlp(sd: StateDict, prefix: str, num_layers: int) -> Dict:
    """modeling.py MLP: linear_hidden = [Identity, (Linear, BN, ReLU)*] +
    linear_out. torch Sequential indices: Linear at 1+3j, BN at 2+3j."""
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for j in range(num_layers - 1):
        li, bi = 1 + 3 * j, 2 + 3 * j
        params[f"hidden_{j}"] = _lin(sub, f"linear_hidden.{li}")
        params[f"bn_{j}"] = {
            "scale": sub[f"linear_hidden.{bi}.weight"],
            "bias": sub[f"linear_hidden.{bi}.bias"],
        }
        stats[f"bn_{j}"] = {
            "mean": sub[f"linear_hidden.{bi}.running_mean"],
            "var": sub[f"linear_hidden.{bi}.running_var"],
        }
    params["out"] = _lin(sub, "linear_out")
    return {"params": params, "batch_stats": stats}


def _import_mlm_head(sd: StateDict, prefix: str) -> Dict:
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    decoder = {"kernel": np.ascontiguousarray(sub["decoder.weight"].T)}
    # decoder bias is the separate `bias` param tied onto decoder
    # (module_cross.py:315-317)
    decoder["bias"] = sub["bias"] if "bias" in sub else sub["decoder.bias"]
    return {
        "transform_dense": _lin(sub, "transform.dense"),
        "transform_ln": {
            "scale": sub["transform.LayerNorm.weight"],
            "bias": sub["transform.LayerNorm.bias"],
        },
        "decoder": decoder,
    }


def import_hmmc_state_dict(
    sd: StateDict,
    language: str = "english",
    use_temp: bool = True,
    pretrain: bool = False,
    proj_num_layers: int = 2,
    pred_num_layers: int = 2,
) -> Dict[str, Any]:
    """Reference HMMC checkpoint -> variables for our task models.

    Returns a dict with 'params' (and 'batch_stats', 'queues' when present).
    Layout matches BirdModel / BirdPreTrainedModel (modeling.py:88-151,
    648-663). Keys the checkpoint lacks are simply absent (partial load, as
    in until_module.py:129-160); the caller merges over fresh init."""
    sd = remap_gamma_beta(sd)
    batch_stats: Dict[str, Any] = {}
    visual_stats: Dict[str, Any] = {}
    params: Dict[str, Any] = {
        "text_encoder": _import_text_encoder(sd, "text_encoder.", language),
        "visual_encoder": _import_visual_encoder(
            sd, "visual_encoder.", use_temp, out_stats=visual_stats),
    }
    if visual_stats:
        batch_stats["visual_encoder"] = visual_stats
    out: Dict[str, Any] = {"params": params}
    if not pretrain:
        if batch_stats:
            out["batch_stats"] = batch_stats
        return out
    for tower, nl in (("t_projector", proj_num_layers),
                      ("t_projector_k", proj_num_layers),
                      ("v_projector", proj_num_layers),
                      ("v_projector_k", proj_num_layers),
                      ("v_predictor", pred_num_layers)):
        if any(k.startswith(tower + ".") for k in sd):
            imported = _import_mlp(sd, tower + ".", nl)
            params[tower] = imported["params"]
            batch_stats[tower] = imported["batch_stats"]
    if any(k.startswith("cls.") for k in sd):
        params["cls"] = _import_mlm_head(sd, "cls.")
    for k_enc, prefix in (("text_encoder_k", "text_encoder_k."),
                          ("visual_encoder_k", "visual_encoder_k.")):
        if any(k.startswith(prefix) for k in sd):
            if k_enc == "text_encoder_k":
                params[k_enc] = _import_text_encoder(sd, prefix, language)
            else:
                params[k_enc] = _import_visual_encoder(sd, prefix, use_temp)
    if batch_stats:
        out["batch_stats"] = batch_stats

    queues = {}
    for qname in ("queue_v_cross_ng", "queue_frame_proj_ng",
                  "queue_frame_cross_ng", "queue_title_cross_ng",
                  "queue_tag_cross_ng", "queue_ptr"):
        if qname in sd:
            queues[qname] = sd[qname]
    if queues:
        out["queues"] = queues
    return out


# --------------------------------------------------------------------------
# merge with reporting (partial-load semantics of until_module.py:129-160)
# --------------------------------------------------------------------------

def _flatten(tree: Dict, prefix: str = "") -> Dict[str, Array]:
    flat = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            flat.update(_flatten(v, path))
        else:
            flat[path] = v
    return flat


def merge_params(init: Dict, imported: Dict,
                 log: logging.Logger = logger) -> Dict:
    """Overlay imported params onto a freshly initialized tree, reporting
    missing (kept at init) and unexpected (dropped) entries, and verifying
    shapes."""
    init_flat = _flatten(init)
    imp_flat = _flatten(imported)
    missing = sorted(set(init_flat) - set(imp_flat))
    unexpected = sorted(set(imp_flat) - set(init_flat))
    if missing:
        log.info("Weights not initialized from checkpoint:\n   %s",
                 "\n   ".join(missing))
    if unexpected:
        log.info("Checkpoint weights not used:\n   %s",
                 "\n   ".join(unexpected))

    def merge(dst: Dict, src: Dict, path: str = ""):
        out = {}
        for k, v in dst.items():
            p = f"{path}/{k}" if path else str(k)
            if k in src:
                if isinstance(v, dict):
                    out[k] = merge(v, src[k], p)
                else:
                    sv = np.asarray(src[k])
                    if tuple(sv.shape) != tuple(np.shape(v)):
                        if sv.size == np.size(v):
                            # e.g. scalar logit_scale stored as shape (1,)
                            sv = sv.reshape(np.shape(v))
                        else:
                            raise ValueError(
                                f"shape mismatch at {p}: checkpoint "
                                f"{sv.shape} vs model {np.shape(v)}")
                    out[k] = sv.astype(np.asarray(v).dtype)
            else:
                out[k] = v
        return out

    return merge(init, imported)


# --------------------------------------------------------------------------
# export back to a reference-compatible torch state dict
# --------------------------------------------------------------------------

def _export_resblocks(tree: Dict, prefix: str, out: StateDict) -> None:
    block = tree["resblocks"]["block"]
    layers = block["attn"]["in_proj_kernel"].shape[0]
    for i in range(layers):
        b = f"{prefix}.resblocks.{i}"
        out[f"{b}.attn.in_proj_weight"] = np.ascontiguousarray(
            np.asarray(block["attn"]["in_proj_kernel"][i]).T)
        out[f"{b}.attn.in_proj_bias"] = np.asarray(
            block["attn"]["in_proj_bias"][i])
        out[f"{b}.attn.out_proj.weight"] = np.ascontiguousarray(
            np.asarray(block["attn"]["out_kernel"][i]).T)
        out[f"{b}.attn.out_proj.bias"] = np.asarray(
            block["attn"]["out_bias"][i])
        out[f"{b}.ln_1.weight"] = np.asarray(block["ln_1"]["scale"][i])
        out[f"{b}.ln_1.bias"] = np.asarray(block["ln_1"]["bias"][i])
        out[f"{b}.ln_2.weight"] = np.asarray(block["ln_2"]["scale"][i])
        out[f"{b}.ln_2.bias"] = np.asarray(block["ln_2"]["bias"][i])
        out[f"{b}.mlp.c_fc.weight"] = np.ascontiguousarray(
            np.asarray(block["c_fc"]["kernel"][i]).T)
        out[f"{b}.mlp.c_fc.bias"] = np.asarray(block["c_fc"]["bias"][i])
        out[f"{b}.mlp.c_proj.weight"] = np.ascontiguousarray(
            np.asarray(block["c_proj"]["kernel"][i]).T)
        out[f"{b}.mlp.c_proj.bias"] = np.asarray(block["c_proj"]["bias"][i])


def export_clip_text(params: Dict, out: Optional[StateDict] = None,
                     prefix: str = "") -> StateDict:
    """ClipTextTower params -> OpenAI-CLIP-style names (for interop tests
    and for writing reference-compatible checkpoints)."""
    sd: StateDict = {} if out is None else out
    p = params
    sd[f"{prefix}token_embedding.weight"] = np.asarray(p["token_embedding"])
    sd[f"{prefix}positional_embedding"] = np.asarray(
        p["positional_embedding"])
    sd[f"{prefix}text_projection"] = np.asarray(p["text_projection"])
    sd[f"{prefix}ln_final.weight"] = np.asarray(p["ln_final"]["scale"])
    sd[f"{prefix}ln_final.bias"] = np.asarray(p["ln_final"]["bias"])
    inner: StateDict = {}
    _export_resblocks(p["transformer"], "transformer", inner)
    sd.update({prefix + k: v for k, v in inner.items()})
    return sd


def export_clip_visual(params: Dict, out: Optional[StateDict] = None,
                       prefix: str = "visual.") -> StateDict:
    sd: StateDict = {} if out is None else out
    p = params
    if "conv1" in p:
        sd[f"{prefix}conv1.weight"] = np.ascontiguousarray(
            np.asarray(p["conv1"]["kernel"]).transpose(3, 2, 0, 1))
    if "conv2" in p:
        sd[f"{prefix}conv2.weight"] = np.ascontiguousarray(
            np.asarray(p["conv2"]["kernel"]).transpose(4, 3, 0, 1, 2))
    sd[f"{prefix}class_embedding"] = np.asarray(p["class_embedding"])
    sd[f"{prefix}positional_embedding"] = np.asarray(
        p["positional_embedding"])
    sd[f"{prefix}proj"] = np.asarray(p["proj"])
    for ln in ("ln_pre", "ln_post"):
        sd[f"{prefix}{ln}.weight"] = np.asarray(p[ln]["scale"])
        sd[f"{prefix}{ln}.bias"] = np.asarray(p[ln]["bias"])
    inner: StateDict = {}
    _export_resblocks(p["transformer"], "transformer", inner)
    sd.update({prefix + k: v for k, v in inner.items()})
    return sd


def export_hf_bert(params: Dict, out: Optional[StateDict] = None,
                   prefix: str = "") -> StateDict:
    """BertEncoder params -> HF BertModel names (inverse of
    :func:`import_hf_bert`; the chinese tower round-trips through the
    reference checkpoint format)."""
    sd: StateDict = {} if out is None else out
    p = params
    sd[f"{prefix}embeddings.word_embeddings.weight"] = np.asarray(
        p["word_embeddings"])
    sd[f"{prefix}embeddings.position_embeddings.weight"] = np.asarray(
        p["position_embeddings"])
    sd[f"{prefix}embeddings.token_type_embeddings.weight"] = np.asarray(
        p["token_type_embeddings"])
    sd[f"{prefix}embeddings.LayerNorm.weight"] = np.asarray(
        p["embeddings_ln"]["scale"])
    sd[f"{prefix}embeddings.LayerNorm.bias"] = np.asarray(
        p["embeddings_ln"]["bias"])
    block = p["layer"]
    layers = np.asarray(block["attn"]["in_proj_kernel"]).shape[0]
    hidden = np.asarray(block["attn"]["in_proj_kernel"]).shape[1]
    for i in range(layers):
        b = f"{prefix}encoder.layer.{i}"
        qkv_k = np.asarray(block["attn"]["in_proj_kernel"][i])  # [D, 3D]
        qkv_b = np.asarray(block["attn"]["in_proj_bias"][i])
        for j, name in enumerate(("query", "key", "value")):
            sd[f"{b}.attention.self.{name}.weight"] = np.ascontiguousarray(
                qkv_k[:, j * hidden:(j + 1) * hidden].T)
            sd[f"{b}.attention.self.{name}.bias"] = (
                qkv_b[j * hidden:(j + 1) * hidden])
        sd[f"{b}.attention.output.dense.weight"] = np.ascontiguousarray(
            np.asarray(block["attn"]["out_kernel"][i]).T)
        sd[f"{b}.attention.output.dense.bias"] = np.asarray(
            block["attn"]["out_bias"][i])
        sd[f"{b}.attention.output.LayerNorm.weight"] = np.asarray(
            block["attn_ln"]["scale"][i])
        sd[f"{b}.attention.output.LayerNorm.bias"] = np.asarray(
            block["attn_ln"]["bias"][i])
        sd[f"{b}.intermediate.dense.weight"] = np.ascontiguousarray(
            np.asarray(block["intermediate"]["kernel"][i]).T)
        sd[f"{b}.intermediate.dense.bias"] = np.asarray(
            block["intermediate"]["bias"][i])
        sd[f"{b}.output.dense.weight"] = np.ascontiguousarray(
            np.asarray(block["output"]["kernel"][i]).T)
        sd[f"{b}.output.dense.bias"] = np.asarray(block["output"]["bias"][i])
        sd[f"{b}.output.LayerNorm.weight"] = np.asarray(
            block["output_ln"]["scale"][i])
        sd[f"{b}.output.LayerNorm.bias"] = np.asarray(
            block["output_ln"]["bias"][i])
    sd[f"{prefix}pooler.dense.weight"] = np.ascontiguousarray(
        np.asarray(params["pooler"]["kernel"]).T)
    sd[f"{prefix}pooler.dense.bias"] = np.asarray(params["pooler"]["bias"])
    return sd


def export_mlp(params: Dict, stats: Dict, out: Optional[StateDict] = None,
               prefix: str = "") -> StateDict:
    """ProjectorMLP params/batch_stats -> reference MLP naming (inverse of
    :func:`_import_mlp`; modeling.py:788-807 Sequential indices)."""
    sd: StateDict = {} if out is None else out
    j = 0
    while f"hidden_{j}" in params:
        li, bi = 1 + 3 * j, 2 + 3 * j
        sd[f"{prefix}linear_hidden.{li}.weight"] = np.ascontiguousarray(
            np.asarray(params[f"hidden_{j}"]["kernel"]).T)
        sd[f"{prefix}linear_hidden.{li}.bias"] = np.asarray(
            params[f"hidden_{j}"]["bias"])
        sd[f"{prefix}linear_hidden.{bi}.weight"] = np.asarray(
            params[f"bn_{j}"]["scale"])
        sd[f"{prefix}linear_hidden.{bi}.bias"] = np.asarray(
            params[f"bn_{j}"]["bias"])
        scale = np.asarray(params[f"bn_{j}"]["scale"])
        bn_stats = stats.get(f"bn_{j}", {}) if stats else {}
        sd[f"{prefix}linear_hidden.{bi}.running_mean"] = np.asarray(
            bn_stats.get("mean", np.zeros_like(scale)))
        sd[f"{prefix}linear_hidden.{bi}.running_var"] = np.asarray(
            bn_stats.get("var", np.ones_like(scale)))
        j += 1
    sd[f"{prefix}linear_out.weight"] = np.ascontiguousarray(
        np.asarray(params["out"]["kernel"]).T)
    sd[f"{prefix}linear_out.bias"] = np.asarray(params["out"]["bias"])
    return sd


def export_mlm_head(params: Dict, out: Optional[StateDict] = None,
                    prefix: str = "cls.") -> StateDict:
    """MLM head -> reference naming (inverse of :func:`_import_mlm_head`;
    module_cross.py:308-341 — the decoder bias is the separate tied
    ``bias`` parameter)."""
    sd: StateDict = {} if out is None else out
    sd[f"{prefix}transform.dense.weight"] = np.ascontiguousarray(
        np.asarray(params["transform_dense"]["kernel"]).T)
    sd[f"{prefix}transform.dense.bias"] = np.asarray(
        params["transform_dense"]["bias"])
    sd[f"{prefix}transform.LayerNorm.weight"] = np.asarray(
        params["transform_ln"]["scale"])
    sd[f"{prefix}transform.LayerNorm.bias"] = np.asarray(
        params["transform_ln"]["bias"])
    sd[f"{prefix}decoder.weight"] = np.ascontiguousarray(
        np.asarray(params["decoder"]["kernel"]).T)
    sd[f"{prefix}bias"] = np.asarray(params["decoder"]["bias"])
    return sd
