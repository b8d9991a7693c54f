"""OpenAI CLIP ModifiedResNet checkpoint import: shape-driven arch
detection (module_clip.py:530-579), RN weight mapping into the NHWC flax
tower, and a strict build->import->export round-trip (VERDICT r2 #7)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hmmc_tpu.config import ClipArch
from hmmc_tpu.models.resnet import ModifiedResNet
from hmmc_tpu.train import checkpoint as ckpt

WIDTH, LAYERS, RES, EMB = 16, (3, 4, 6, 3), 64, 48
TW, TLAYERS, CTX, VOCAB = 64, 2, 12, 128


class _Shape:
    """Shape-only stand-in for a tensor — from_state_dict consults nothing
    but ``.shape`` and key names, so real-geometry detection tests (incl.
    RN50x64's ~1.2 GB of weights) cost no memory."""

    def __init__(self, *shape):
        self.shape = shape


def _rn_clip_sd(WIDTH=WIDTH, LAYERS=LAYERS, RES=RES, EMB=EMB, TW=TW,
                TLAYERS=TLAYERS, CTX=CTX, VOCAB=VOCAB, factory=None):
    """Synthetic checkpoint with the ModifiedResNet's exact key naming and
    stage counts (tiny width/resolution by default). Includes
    num_batches_tracked like real torch BN state dicts."""
    g = np.random.default_rng(0)

    def t(*shape):
        if factory is not None:
            return factory(*shape)
        return (g.normal(size=shape) * 0.05).astype(np.float32)

    sd = {}

    def bn(name, c):
        sd[f"{name}.weight"] = t(c)
        sd[f"{name}.bias"] = t(c)
        sd[f"{name}.running_mean"] = t(c)
        rv = t(c)
        sd[f"{name}.running_var"] = (
            rv if factory is not None else np.abs(rv) + 1.0)
        sd[f"{name}.num_batches_tracked"] = (
            t() if factory is not None else np.zeros((), np.int64))

    sd["visual.conv1.weight"] = t(WIDTH // 2, 3, 3, 3)
    bn("visual.bn1", WIDTH // 2)
    sd["visual.conv2.weight"] = t(WIDTH // 2, WIDTH // 2, 3, 3)
    bn("visual.bn2", WIDTH // 2)
    sd["visual.conv3.weight"] = t(WIDTH, WIDTH // 2, 3, 3)
    bn("visual.bn3", WIDTH)

    inplanes, planes = WIDTH, WIDTH
    for s, blocks in enumerate(LAYERS, start=1):
        stride = 1 if s == 1 else 2
        for b in range(blocks):
            p = f"visual.layer{s}.{b}"
            sd[f"{p}.conv1.weight"] = t(planes, inplanes, 1, 1)
            bn(f"{p}.bn1", planes)
            sd[f"{p}.conv2.weight"] = t(planes, planes, 3, 3)
            bn(f"{p}.bn2", planes)
            sd[f"{p}.conv3.weight"] = t(planes * 4, planes, 1, 1)
            bn(f"{p}.bn3", planes * 4)
            if b == 0 and (stride > 1 or inplanes != planes * 4):
                sd[f"{p}.downsample.0.weight"] = t(planes * 4, inplanes,
                                                   1, 1)
                bn(f"{p}.downsample.1", planes * 4)
            inplanes = planes * 4
        planes *= 2

    embed = WIDTH * 32
    sd["visual.attnpool.positional_embedding"] = t((RES // 32) ** 2 + 1,
                                                   embed)
    for proj, o in (("q_proj", embed), ("k_proj", embed),
                    ("v_proj", embed), ("c_proj", EMB)):
        sd[f"visual.attnpool.{proj}.weight"] = t(o, embed)
        sd[f"visual.attnpool.{proj}.bias"] = t(o)

    # text tower (needed by from_state_dict; standard ViT-checkpoint names)
    sd["token_embedding.weight"] = t(VOCAB, TW)
    sd["positional_embedding"] = t(CTX, TW)
    sd["text_projection"] = t(TW, EMB)
    sd["ln_final.weight"] = t(TW)
    sd["ln_final.bias"] = t(TW)
    sd["logit_scale"] = t() if factory is not None else np.float32(4.0)
    for i in range(TLAYERS):
        b = f"transformer.resblocks.{i}"
        sd[f"{b}.attn.in_proj_weight"] = t(3 * TW, TW)
        sd[f"{b}.attn.in_proj_bias"] = t(3 * TW)
        sd[f"{b}.attn.out_proj.weight"] = t(TW, TW)
        sd[f"{b}.attn.out_proj.bias"] = t(TW)
        sd[f"{b}.ln_1.weight"] = t(TW)
        sd[f"{b}.ln_1.bias"] = t(TW)
        sd[f"{b}.ln_2.weight"] = t(TW)
        sd[f"{b}.ln_2.bias"] = t(TW)
        sd[f"{b}.mlp.c_fc.weight"] = t(4 * TW, TW)
        sd[f"{b}.mlp.c_fc.bias"] = t(4 * TW)
        sd[f"{b}.mlp.c_proj.weight"] = t(TW, 4 * TW)
        sd[f"{b}.mlp.c_proj.bias"] = t(TW)
    return sd


def test_shape_driven_arch_detection():
    """ClipArch.from_state_dict mirrors the reference's shape sniffing for
    both tower families (module_clip.py:530-549)."""
    sd = _rn_clip_sd()
    arch = ClipArch.from_state_dict(sd)
    assert arch.is_resnet
    assert arch.vision_layers == LAYERS
    assert arch.vision_width == WIDTH
    assert arch.image_resolution == RES
    assert arch.vision_patch_size == 0
    assert arch.embed_dim == EMB
    assert arch.context_length == CTX
    assert arch.vocab_size == VOCAB
    assert arch.transformer_width == TW
    assert arch.transformer_layers == TLAYERS
    assert arch.vision_heads == WIDTH * 32 // 64


def _flat_paths(tree):
    return {jax.tree_util.keystr(kp): np.asarray(v).shape
            for kp, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_rn_import_matches_init_structure_and_forward():
    sd = _rn_clip_sd()
    arch = ClipArch.from_state_dict(sd)
    net = ModifiedResNet(
        layers=tuple(arch.vision_layers), output_dim=arch.embed_dim,
        heads=arch.vision_heads, input_resolution=arch.image_resolution,
        width=arch.vision_width)
    x = jnp.ones((2, RES, RES, 3))
    init_vars = net.init(jax.random.PRNGKey(0), x)

    params, stats = ckpt.import_clip_resnet(sd, "visual")
    # exact tree congruence with a fresh init (every param consumed)
    assert _flat_paths(init_vars["params"]) == _flat_paths(params)
    assert _flat_paths(init_vars["batch_stats"]) == _flat_paths(stats)

    out = net.apply({"params": params, "batch_stats": stats}, x)
    assert out.shape == (2, EMB)
    assert np.isfinite(np.asarray(out)).all()


def test_rn_export_round_trip_strict():
    """build -> import -> export reproduces the reference state dict with
    STRICT name equality and exact values (VERDICT done-criterion)."""
    sd = _rn_clip_sd()
    params, stats = ckpt.import_clip_resnet(sd, "visual")
    out = ckpt.export_clip_resnet(params, stats, prefix="visual.")
    want = {k: v for k, v in sd.items() if k.startswith("visual.")}
    assert set(out) == set(want)
    for k in want:
        np.testing.assert_allclose(out[k], want[k], atol=0, rtol=0,
                                   err_msg=k)


def test_build_model_with_rn_checkpoint(tmp_path):
    """factory.build_model consumes an RN CLIP checkpoint end-to-end:
    shape-driven arch, weights + BN stats land, video forward runs."""
    torch = pytest.importorskip("torch")

    from hmmc_tpu import factory
    from hmmc_tpu.config import CrossConfig, TaskConfig

    sd = _rn_clip_sd()
    path = str(tmp_path / "RN-tiny.pt")
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
               path)

    cross_json = tmp_path / "cross.json"
    cross_json.write_text(json.dumps({
        "pretrained_clip_name": "RN50", "temporal_hidden_size": EMB,
        "temporal_attention_heads": 2, "temporal_hidden_layers": 1,
        "max_position_embeddings": 8}))
    task = TaskConfig(do_eval=True, language="english",
                      cross_model=str(cross_json), max_words=CTX,
                      max_frames=2, compute_dtype="float32")
    cross = CrossConfig.from_json(str(cross_json))
    model, variables = factory.build_model(
        task, cross, vocab_size=VOCAB, clip_model_path=path)

    p = variables["params"]
    np.testing.assert_allclose(
        np.asarray(p["visual_encoder"]["visual"]["attnpool"]["c_proj"]
                   ["kernel"]),
        sd["visual.attnpool.c_proj.weight"].T, atol=1e-6)
    bs = variables["batch_stats"]["visual_encoder"]["visual"]
    np.testing.assert_allclose(np.asarray(bs["bn1"]["mean"]),
                               sd["visual.bn1.running_mean"], atol=1e-6)

    video = jnp.zeros((1, 2, RES, RES, 3), jnp.float32)
    v, f = model.apply(
        {"params": p, "batch_stats": variables["batch_stats"]}, video,
        method="encode_video")
    assert v.shape == (1, EMB) and f.shape == (1, 2, EMB)
    assert np.isfinite(np.asarray(v)).all()


def test_rn_finetune_step_eval_and_export(tmp_path):
    """RN towers TRAIN end-to-end: the finetune step threads BatchNorm
    batch stats (torch updates them inside its modules — here they ride
    FinetuneState), the evaluator reads the frozen running stats, and the
    reference export carries the UPDATED running stats back out. The
    reference itself cannot run this config at all (its 512-wide frame
    position embeddings break on RN50's 1024-dim features,
    module_cross.py:198)."""
    torch = pytest.importorskip("torch")

    from hmmc_tpu import factory
    from hmmc_tpu.config import CrossConfig, TaskConfig
    from hmmc_tpu.evaluation import Evaluator
    from hmmc_tpu.train.optimization import build_optimizer
    from hmmc_tpu.train.orbax_io import save_reference_checkpoint
    from hmmc_tpu.train.trainer import FinetuneState, make_finetune_step

    sd = _rn_clip_sd()
    path = str(tmp_path / "RN-tiny.pt")
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
               path)
    cross_json = tmp_path / "cross.json"
    cross_json.write_text(json.dumps({
        "pretrained_clip_name": "RN50", "temporal_hidden_size": EMB,
        "temporal_attention_heads": 2, "temporal_hidden_layers": 1,
        "max_position_embeddings": 8}))
    task = TaskConfig(do_train=True, language="english",
                      cross_model=str(cross_json), max_words=CTX,
                      max_frames=2, compute_dtype="float32")
    cross = CrossConfig.from_json(str(cross_json))
    model, variables = factory.build_model(
        task, cross, vocab_size=VOCAB, clip_model_path=path)

    params = variables["params"]
    tx = build_optimizer(params, lr=1e-3, text_lr=1e-4, coef_lr=1.0,
                         weight_decay=0.2, warmup_proportion=0.1,
                         t_total=20)
    state = FinetuneState.create(params, tx, variables["batch_stats"])
    step = make_finetune_step(model, tx, cross, use_frame_fea=True)

    g = np.random.default_rng(3)
    b = 4
    ids = g.integers(2, VOCAB, size=(b, CTX)).astype(np.int32)
    ids[:, -1] = VOCAB - 1
    batch = {
        "query_ids": jnp.asarray(ids),
        "query_mask": jnp.ones((b, CTX), jnp.int32),
        "video": jnp.asarray(g.normal(size=(b, 2, RES, RES, 3))
                             .astype(np.float32)),
    }
    mean0 = np.asarray(
        state.batch_stats["visual_encoder"]["visual"]["bn1"]["mean"])
    state, m0 = step(state, batch)
    state, m1 = step(state, batch)
    assert np.isfinite(float(m0["loss"])) and np.isfinite(float(m1["loss"]))
    mean2 = np.asarray(
        state.batch_stats["visual_encoder"]["visual"]["bn1"]["mean"])
    assert not np.allclose(mean0, mean2)  # train-mode BN updated stats

    # evaluator path reads the running stats (frozen)
    ev = Evaluator(model, task)
    video_u8 = g.integers(0, 255, size=(2, 2, RES, RES, 3)).astype(np.uint8)
    v, f = ev._encode_video(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(video_u8))
    assert v.shape == (2, EMB)
    assert np.isfinite(np.asarray(v)).all()

    # reference-format export carries the UPDATED running stats
    out_pt = str(tmp_path / "export.bin")
    save_reference_checkpoint(out_pt, state.params, language="english",
                              batch_stats=state.batch_stats)
    sd2 = {k: v.numpy() for k, v in torch.load(
        out_pt, map_location="cpu", weights_only=True).items()}
    np.testing.assert_allclose(
        sd2["visual_encoder.visual.bn1.running_mean"], mean2, atol=1e-6)


def test_rn_pretrain_step_keeps_visual_bn_frozen():
    """MoCo pretrain with an RN tower: the step threads the RN BatchNorm
    running stats through both the query and momentum-key visual forwards
    and keeps them FROZEN (the reference never pretrains RN either —
    modeling.py hard-codes 512-dim MLP heads), while the projector MLP
    BN stats still evolve per micro-batch (modeling.py:788-807)."""
    from hmmc_tpu.config import ClipArch, CrossConfig, TaskConfig
    from hmmc_tpu.models.pretrain import BirdPretrainModel, MoCoQueues
    from hmmc_tpu.train.optimization import build_optimizer
    from hmmc_tpu.train.trainer import PretrainState, make_pretrain_step

    F, B = 2, 4
    arch = ClipArch(
        embed_dim=32, image_resolution=32, vision_layers=(1, 1, 1, 1),
        vision_width=8, vision_patch_size=0, context_length=CTX,
        vocab_size=VOCAB, transformer_width=32, transformer_heads=2,
        transformer_layers=2)
    cross = CrossConfig(temporal_hidden_size=32, temporal_attention_heads=2,
                        temporal_hidden_layers=1, max_position_embeddings=8)
    task = TaskConfig(do_pretrain=True, dataset="msrvtt",
                      contrast_num_negative=16, max_frames=F,
                      contrast_temperature=0.07, contrast_momentum=0.9)
    model = BirdPretrainModel(arch, cross, vocab_size=VOCAB)
    g = np.random.default_rng(11)
    ids = g.integers(2, VOCAB - 2, size=(B, CTX)).astype(np.int32)
    batch = {
        "title_ids": jnp.asarray(ids),
        "title_mask": jnp.ones((B, CTX), jnp.int32),
        "video": jnp.asarray(
            g.normal(size=(B, F, 32, 32, 3)).astype(np.float32)),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["title_ids"],
                           batch["title_mask"], batch["video"])
    tx = build_optimizer(variables["params"], lr=1e-3, text_lr=1e-4,
                         coef_lr=1.0, weight_decay=0.2,
                         warmup_proportion=0.1, t_total=20)
    queues = MoCoQueues.create(jax.random.PRNGKey(1), arch.embed_dim,
                               task.contrast_num_negative, F)
    state = PretrainState.create(variables, tx, queues)
    step = make_pretrain_step(model, tx, cross, task,
                              mask_token_id=VOCAB - 2,
                              pad_token_id=VOCAB - 1, cls_token_id=1)

    vis0 = np.asarray(
        state.batch_stats["visual_encoder"]["visual"]["bn1"]["mean"])
    proj0 = np.asarray(jax.tree_util.tree_leaves(
        state.batch_stats["v_projector"])[0])
    state, m = step(state, batch, jax.random.PRNGKey(3))
    state, m = step(state, batch, jax.random.PRNGKey(4))
    for k in ("loss", "loss_FAM", "loss_VTM", "loss_FTM", "loss_MLM"):
        assert np.isfinite(float(m[k])), k
    vis2 = np.asarray(
        state.batch_stats["visual_encoder"]["visual"]["bn1"]["mean"])
    proj2 = np.asarray(jax.tree_util.tree_leaves(
        state.batch_stats["v_projector"])[0])
    np.testing.assert_array_equal(vis0, vis2)       # frozen RN BN
    assert not np.allclose(proj0, proj2)            # projector BN evolved
    assert int(state.queues.ptr) == (2 * B) % task.contrast_num_negative


@pytest.mark.parametrize(
    "name", ["RN50", "RN101", "RN50x4", "RN50x16", "RN50x64"])
def test_rn_zoo_name_table_matches_shape_detection(name):
    """Every ResNet in the reference's model zoo (module_clip.py:21-25),
    including the EfficientNet-style scaled RN50x4/x16/x64: a shape-only
    state dict at the REAL released geometry detects to exactly the
    CLIP_ARCH name-table entry, so --pretrained_clip_name builds and
    checkpoint-driven builds (module_clip.py:536-549) agree across the
    full zoo."""
    want = ClipArch.by_name(name)
    sd = _rn_clip_sd(
        WIDTH=want.vision_width, LAYERS=tuple(want.vision_layers),
        RES=want.image_resolution, EMB=want.embed_dim,
        TW=want.transformer_width, TLAYERS=want.transformer_layers,
        CTX=want.context_length, VOCAB=want.vocab_size, factory=_Shape)
    assert ClipArch.from_state_dict(sd) == want


def _vit_shape_sd(want):
    """Shape-only OpenAI ViT-CLIP state dict at a named geometry — only
    the keys from_state_dict consults (module_clip.py:530-545)."""
    w, p = want.vision_width, want.vision_patch_size
    grid = want.image_resolution // p
    sd = {
        "visual.proj": _Shape(w, want.embed_dim),
        "visual.conv1.weight": _Shape(w, 3, p, p),
        "visual.positional_embedding": _Shape(grid * grid + 1, w),
        "token_embedding.weight": _Shape(want.vocab_size,
                                         want.transformer_width),
        "positional_embedding": _Shape(want.context_length,
                                       want.transformer_width),
        "text_projection": _Shape(want.transformer_width, want.embed_dim),
        "ln_final.weight": _Shape(want.transformer_width),
    }
    for i in range(want.vision_layers):
        sd[f"visual.transformer.resblocks.{i}.attn.in_proj_weight"] = \
            _Shape(3 * w, w)
    for i in range(want.transformer_layers):
        sd[f"transformer.resblocks.{i}.attn.in_proj_weight"] = \
            _Shape(3 * want.transformer_width, want.transformer_width)
    return sd


@pytest.mark.parametrize(
    "name", ["ViT-B/32", "ViT-B/16", "ViT-L/14", "ViT-L/14@336px"])
def test_vit_zoo_name_table_matches_shape_detection(name):
    """The ViT half of the reference's model zoo (module_clip.py:26-29),
    including the high-resolution ViT-L/14@336px release (577-token
    grid): shape detection at the real released geometry agrees with the
    CLIP_ARCH name table, so name-driven and checkpoint-driven builds
    coincide across the whole zoo."""
    want = ClipArch.by_name(name)
    assert ClipArch.from_state_dict(_vit_shape_sd(want)) == want


def test_scaled_rn_tiny_import_and_forward():
    """The x4-style scaled stage pattern (4/6/10/6 blocks, non-default
    stem width) builds, imports, and forwards — stage-count and width
    generality of import_clip_resnet beyond the RN50 shape."""
    layers, width, res, emb = (4, 6, 10, 6), 16, 96, 40
    sd = _rn_clip_sd(WIDTH=width, LAYERS=layers, RES=res, EMB=emb)
    arch = ClipArch.from_state_dict(sd)
    assert arch.vision_layers == layers
    assert arch.image_resolution == res
    net = ModifiedResNet(layers=layers, output_dim=emb,
                         heads=arch.vision_heads, input_resolution=res,
                         width=width)
    params, stats = ckpt.import_clip_resnet(sd, "visual")
    init_vars = net.init(jax.random.PRNGKey(0), jnp.ones((1, res, res, 3)))
    assert _flat_paths(init_vars["params"]) == _flat_paths(params)
    out = net.apply({"params": params, "batch_stats": stats},
                    jnp.ones((1, res, res, 3)))
    assert out.shape == (1, emb)
    assert np.isfinite(np.asarray(out)).all()
    # strict export round-trip holds for the scaled pattern too
    back = ckpt.export_clip_resnet(params, stats, prefix="visual.")
    want = {k: v for k, v in sd.items() if k.startswith("visual.")}
    assert set(back) == set(want)
