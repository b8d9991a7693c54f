"""Shape/behavior tests for the encoder stack on a tiny architecture."""

import jax
import jax.numpy as jnp
import numpy as np

from hmmc_tpu.config import ClipArch, CrossConfig
from hmmc_tpu.models import (
    MLMHead, ProjectorMLP, TextEncoder, VisionTransformer, VisualEncoder)
from hmmc_tpu.models.text import ClipTextTower

TINY = ClipArch(
    embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
    vision_patch_size=16, context_length=16, vocab_size=256,
    transformer_width=32, transformer_heads=2, transformer_layers=2)

TINY_CROSS = CrossConfig(
    temporal_hidden_size=32, temporal_attention_heads=2,
    temporal_hidden_layers=2, max_position_embeddings=8,
    chinese_hidden_size=48)


def test_vit_shapes():
    vit = VisionTransformer(TINY)
    x = jnp.ones((3, 32, 32, 3))
    params = vit.init(jax.random.PRNGKey(0), x)
    pooled = vit.apply(params, x)
    assert pooled.shape == (3, 32)
    pooled2, hidden = vit.apply(params, x, return_hidden=True)
    assert hidden.shape == (3, 5, 32)  # 4 patches + cls
    np.testing.assert_allclose(pooled, pooled2, rtol=1e-6)
    np.testing.assert_allclose(pooled, hidden[:, 0, :], rtol=1e-6)


def test_vit_3d_tube_patch():
    """linear_patch='3d' (module_clip.py:291-311): the tube conv consumes
    [N, F, H, W, 3] with a temporal kernel of 3 (pad 1, stride 1) and
    yields per-frame pooled features [N*F, embed]; the VisualEncoder
    routes the un-flattened video straight into it."""
    import dataclasses

    arch = dataclasses.replace(TINY, linear_patch="3d")
    vit = VisionTransformer(arch)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 3, 32, 32, 3)).astype(np.float32))
    params = vit.init(jax.random.PRNGKey(0), x)
    pooled = vit.apply(params, x)
    assert pooled.shape == (2 * 3, 32)
    # temporal kernel 3 => frame i's feature depends on frames i-1..i+1
    # but NOT on i+2 (locality of the tube conv + per-frame transformer)
    x2 = x.at[:, 2].set(0.0)
    p2 = vit.apply(params, x2)
    assert not np.allclose(p2[1::3], pooled[1::3])   # neighbor changed
    np.testing.assert_allclose(p2[0::3], pooled[0::3], rtol=1e-5)


def test_visual_encoder_3d_and_import_inflation():
    """VisualEncoder with a 3d arch + import_clip_visual(inflate_3d=True):
    a 2d OpenAI conv kernel inflates to the tube's center tap (zero side
    taps), so the 3d tower's first-step outputs EQUAL the 2d tower's on
    the same weights — the CLIP4Clip-style init the reference vendors
    (module_clip.py:293-305)."""
    import dataclasses

    from hmmc_tpu.train import checkpoint as ckpt

    g = np.random.default_rng(1)
    video = jnp.asarray(g.normal(size=(2, 3, 32, 32, 3)).astype(np.float32))

    enc2d = VisualEncoder(TINY, TINY_CROSS, use_temp=False)
    v2d = enc2d.init(jax.random.PRNGKey(0), video)["params"]

    # export-shaped state dict from the 2d params (OpenAI names)
    sd = {}
    k = np.asarray(v2d["visual"]["conv1"]["kernel"])  # [kh, kw, I, O]
    sd["visual.conv1.weight"] = np.ascontiguousarray(
        k.transpose(3, 2, 0, 1))
    sd["visual.class_embedding"] = np.asarray(
        v2d["visual"]["class_embedding"])
    sd["visual.positional_embedding"] = np.asarray(
        v2d["visual"]["positional_embedding"])
    sd["visual.proj"] = np.asarray(v2d["visual"]["proj"])
    for ln in ("ln_pre", "ln_post"):
        sd[f"visual.{ln}.weight"] = np.asarray(v2d["visual"][ln]["scale"])
        sd[f"visual.{ln}.bias"] = np.asarray(v2d["visual"][ln]["bias"])
    tr = v2d["visual"]["transformer"]["resblocks"]["block"]
    n_layers = np.asarray(
        jax.tree_util.tree_leaves(tr)[0]).shape[0]
    for i in range(n_layers):
        b = f"visual.transformer.resblocks.{i}"
        blk = jax.tree_util.tree_map(lambda a, i=i: np.asarray(a)[i], tr)
        sd[f"{b}.attn.in_proj_weight"] = blk["attn"]["in_proj_kernel"].T
        sd[f"{b}.attn.in_proj_bias"] = blk["attn"]["in_proj_bias"]
        sd[f"{b}.attn.out_proj.weight"] = blk["attn"]["out_kernel"].T
        sd[f"{b}.attn.out_proj.bias"] = blk["attn"]["out_bias"]
        sd[f"{b}.ln_1.weight"] = blk["ln_1"]["scale"]
        sd[f"{b}.ln_1.bias"] = blk["ln_1"]["bias"]
        sd[f"{b}.ln_2.weight"] = blk["ln_2"]["scale"]
        sd[f"{b}.ln_2.bias"] = blk["ln_2"]["bias"]
        sd[f"{b}.mlp.c_fc.weight"] = blk["c_fc"]["kernel"].T
        sd[f"{b}.mlp.c_fc.bias"] = blk["c_fc"]["bias"]
        sd[f"{b}.mlp.c_proj.weight"] = blk["c_proj"]["kernel"].T
        sd[f"{b}.mlp.c_proj.bias"] = blk["c_proj"]["bias"]

    arch3d = dataclasses.replace(TINY, linear_patch="3d")
    enc3d = VisualEncoder(arch3d, TINY_CROSS, use_temp=False)
    init3d = enc3d.init(jax.random.PRNGKey(0), video)["params"]
    imported = ckpt.import_clip_visual(sd, "visual", inflate_3d=True)

    def shapes(t):
        return {jax.tree_util.keystr(p): np.shape(l) for p, l in
                jax.tree_util.tree_flatten_with_path(t)[0]}

    assert shapes(init3d["visual"]) == shapes(imported)

    p3d = {"visual": jax.tree_util.tree_map(jnp.asarray, imported)}
    v_feat2, frames2 = enc2d.apply({"params": v2d}, video)
    v_feat3, frames3 = enc3d.apply({"params": p3d}, video)
    # center-tap inflation + zero padding => identical per-frame features
    # wherever the temporal taps see only the frame itself... the side
    # taps are ZERO, so EVERY frame matches the 2d tower exactly
    np.testing.assert_allclose(frames3, frames2, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(v_feat3, v_feat2, rtol=2e-5, atol=2e-6)


def test_clip_text_eot_pooling():
    tower = ClipTextTower(TINY)
    ids = jnp.array([[5, 7, 255, 0, 0, 0, 0, 0],
                     [5, 7, 9, 11, 255, 0, 0, 0]], dtype=jnp.int32)
    params = tower.init(jax.random.PRNGKey(0), ids)
    pooled, hidden = tower.apply(params, ids, return_hidden=True)
    assert pooled.shape == (2, 32) and hidden.shape == (2, 8, 32)
    # pooled must equal the hidden state at the EOT (max-id) position
    np.testing.assert_allclose(pooled[0], hidden[0, 2], rtol=1e-6)
    np.testing.assert_allclose(pooled[1], hidden[1, 4], rtol=1e-6)


def test_causal_mask_independence():
    """Tokens after EOT must not influence the pooled feature (causality)."""
    tower = ClipTextTower(TINY)
    ids1 = jnp.array([[5, 7, 255, 0, 0, 0, 0, 0]], dtype=jnp.int32)
    ids2 = jnp.array([[5, 7, 255, 9, 13, 2, 2, 2]], dtype=jnp.int32)
    params = tower.init(jax.random.PRNGKey(0), ids1)
    p1 = tower.apply(params, ids1)
    p2 = tower.apply(params, ids2)
    # ids2's max is still 255 at position 2; suffix differs but is masked
    np.testing.assert_allclose(p1, p2, atol=1e-5)


def test_visual_encoder_outputs():
    enc = VisualEncoder(TINY, TINY_CROSS, use_temp=True)
    video = jnp.ones((2, 4, 32, 32, 3))
    params = enc.init(jax.random.PRNGKey(0), video)
    v_fea, frame_fea = enc.apply(params, video)
    assert v_fea.shape == (2, 32)
    assert frame_fea.shape == (2, 4, 32)
    # video feature is a mean of unit vectors -> norm <= 1
    norms = np.linalg.norm(np.asarray(v_fea), axis=-1)
    assert np.all(norms <= 1.0 + 1e-5)


def test_visual_encoder_no_temp():
    enc = VisualEncoder(TINY, TINY_CROSS, use_temp=False)
    video = jnp.ones((2, 4, 32, 32, 3))
    params = enc.init(jax.random.PRNGKey(0), video)
    v_fea, frame_fea = enc.apply(params, video)
    # without the temporal transformer, v_fea is the mean of normalized
    # frame features
    normed = np.asarray(frame_fea)
    normed = normed / np.linalg.norm(normed, axis=-1, keepdims=True)
    np.testing.assert_allclose(v_fea, normed.mean(axis=1), rtol=1e-5)


def test_text_encoder_english_hidden():
    enc = TextEncoder(TINY, TINY_CROSS, language="english")
    ids = jnp.array([[5, 7, 255, 0]], dtype=jnp.int32)
    mask = jnp.array([[1, 1, 1, 0]], dtype=jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), ids, mask)
    pooled = enc.apply(params, ids, mask)
    hidden = enc.apply(params, ids, mask, return_hidden=True)
    assert pooled.shape == (1, 32)
    assert hidden.shape == (1, 4, 32)
    assert "logit_scale" in params["params"]


def test_text_encoder_chinese():
    enc = TextEncoder(
        TINY, TINY_CROSS, language="chinese", chinese_vocab_size=128)
    ids = jnp.array([[3, 9, 2, 0]], dtype=jnp.int32)
    mask = jnp.array([[1, 1, 1, 0]], dtype=jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), ids, mask)
    pooled = enc.apply(params, ids, mask)
    assert pooled.shape == (1, TINY_CROSS.temporal_hidden_size)
    hidden = enc.apply(params, ids, mask, return_hidden=True)
    assert hidden.shape == (1, 4, TINY_CROSS.temporal_hidden_size)


def test_chinese_padding_mask_effective():
    enc = TextEncoder(
        TINY, TINY_CROSS, language="chinese", chinese_vocab_size=128)
    ids1 = jnp.array([[3, 9, 2, 0, 0]], dtype=jnp.int32)
    ids2 = jnp.array([[3, 9, 2, 55, 77]], dtype=jnp.int32)
    mask = jnp.array([[1, 1, 1, 0, 0]], dtype=jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), ids1, mask)
    p1 = enc.apply(params, ids1, mask)
    p2 = enc.apply(params, ids2, mask)
    np.testing.assert_allclose(p1, p2, atol=1e-5)


def test_mlm_head():
    head = MLMHead(vocab_size=256)
    x = jnp.ones((2, 4, 32))
    params = head.init(jax.random.PRNGKey(0), x)
    logits = head.apply(params, x)
    assert logits.shape == (2, 4, 256)


def test_projector_mlp_batchnorm():
    mlp = ProjectorMLP(num_layers=2, in_dim=32, inner_dim=64, out_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32))
    variables = mlp.init(jax.random.PRNGKey(0), x)
    out, updates = mlp.apply(
        variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (8, 32)
    assert "batch_stats" in updates


def test_bf16_compute():
    vit = VisionTransformer(TINY, dtype=jnp.bfloat16)
    x = jnp.ones((2, 32, 32, 3))
    params = vit.init(jax.random.PRNGKey(0), x)
    pooled = vit.apply(params, x)
    # outputs cast to fp32, params stored fp32
    assert pooled.dtype == jnp.float32
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.dtype == jnp.float32
