"""Numerical parity vs torch primitives.

The checkpoint importer maps torch tensors into our layouts
(train/checkpoint.py); these tests prove the MATH matches too: the same
weights produce the same outputs through torch's nn.MultiheadAttention /
LayerNorm and through our packed-qkv attention / fp32-stats LayerNorm.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from hmmc_tpu.models.layers import LayerNorm, quick_gelu
from hmmc_tpu.ops.attention import causal_mask, multi_head_attention

rng = np.random.default_rng(0)


def _randf(*shape):
    return rng.normal(size=shape).astype(np.float32) * 0.1


def test_multihead_attention_matches_torch():
    B, L, D, H = 3, 7, 16, 4
    x = _randf(B, L, D)
    in_w = _randf(3 * D, D)      # torch layout [3D, D]
    in_b = _randf(3 * D)
    out_w = _randf(D, D)
    out_b = _randf(D)

    mha = torch.nn.MultiheadAttention(D, H, batch_first=False)
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.tensor(in_w))
        mha.in_proj_bias.copy_(torch.tensor(in_b))
        mha.out_proj.weight.copy_(torch.tensor(out_w))
        mha.out_proj.bias.copy_(torch.tensor(out_b))
    tx = torch.tensor(x).permute(1, 0, 2)  # LND like the reference
    ref, _ = mha(tx, tx, tx, need_weights=False)
    ref = ref.permute(1, 0, 2).detach().numpy()

    ours = multi_head_attention(
        jnp.asarray(x), jnp.asarray(in_w.T), jnp.asarray(in_b),
        jnp.asarray(out_w.T), jnp.asarray(out_b), H)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_multihead_attention_causal_matches_torch():
    B, L, D, H = 2, 9, 16, 2
    x = _randf(B, L, D)
    in_w, in_b = _randf(3 * D, D), _randf(3 * D)
    out_w, out_b = _randf(D, D), _randf(D)
    mha = torch.nn.MultiheadAttention(D, H)
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.tensor(in_w))
        mha.in_proj_bias.copy_(torch.tensor(in_b))
        mha.out_proj.weight.copy_(torch.tensor(out_w))
        mha.out_proj.bias.copy_(torch.tensor(out_b))
    # the reference builds a float -inf-style additive causal mask
    # (module_clip.py:441-447)
    tmask = torch.full((L, L), float("-inf")).triu(1)
    tx = torch.tensor(x).permute(1, 0, 2)
    ref, _ = mha(tx, tx, tx, attn_mask=tmask, need_weights=False)
    ref = ref.permute(1, 0, 2).detach().numpy()

    ours = multi_head_attention(
        jnp.asarray(x), jnp.asarray(in_w.T), jnp.asarray(in_b),
        jnp.asarray(out_w.T), jnp.asarray(out_b), H, causal_mask(L))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_batched_head_layout_equals_inplace():
    """`HMMC_ATTN_LAYOUT=batched_head` (ops/attention._mha_batched_head,
    the round-4 measurement apparatus — head split folded into the
    projection GEMM) must be numerically identical to the default
    inplace path, with and without mask / return_weights."""
    from hmmc_tpu.ops import attention as A

    B, L, D, H = 3, 10, 16, 4
    x = jnp.asarray(_randf(B, L, D))
    in_w = jnp.asarray(_randf(D, 3 * D))
    in_b = jnp.asarray(_randf(3 * D))
    out_w = jnp.asarray(_randf(D, D))
    out_b = jnp.asarray(_randf(D))
    for mask in (None, causal_mask(L)):
        ref, wr = multi_head_attention(x, in_w, in_b, out_w, out_b, H,
                                       mask=mask, return_weights=True)
        alt, wa = A._mha_batched_head(x, in_w, in_b, out_w, out_b, H,
                                      mask, True)
        np.testing.assert_allclose(np.asarray(alt), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(wa), np.asarray(wr),
                                   atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("eps", [1e-5, 1e-12])
def test_layernorm_matches_torch(eps):
    D = 24
    x = _randf(4, D) * 3
    w, b = _randf(D) + 1.0, _randf(D)
    tln = torch.nn.LayerNorm(D, eps=eps)
    with torch.no_grad():
        tln.weight.copy_(torch.tensor(w))
        tln.bias.copy_(torch.tensor(b))
    ref = tln(torch.tensor(x)).detach().numpy()

    ln = LayerNorm(eps=eps)
    out = ln.apply({"params": {"scale": jnp.asarray(w),
                               "bias": jnp.asarray(b)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_quick_gelu_matches_reference_formula():
    x = torch.tensor(_randf(64))
    ref = (x * torch.sigmoid(1.702 * x)).numpy()
    np.testing.assert_allclose(
        np.asarray(quick_gelu(jnp.asarray(x.numpy()))), ref, atol=1e-6)


def test_linear_import_layout_round_trip():
    """torch Linear -> our kernel via the importer's transpose."""
    from hmmc_tpu.models.layers import Linear
    from hmmc_tpu.train.checkpoint import _lin

    D_in, D_out = 8, 12
    tl = torch.nn.Linear(D_in, D_out)
    x = _randf(5, D_in)
    ref = tl(torch.tensor(x)).detach().numpy()
    sd = {"fc.weight": tl.weight.detach().numpy(),
          "fc.bias": tl.bias.detach().numpy()}
    params = _lin(sd, "fc")
    ours = Linear(D_out).apply(
        {"params": {"kernel": jnp.asarray(params["kernel"]),
                    "bias": jnp.asarray(params["bias"])}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_batchnorm_import_matches_torch_eval():
    """ProjectorMLP BN running-stats import vs torch BatchNorm1d eval."""
    from hmmc_tpu.models.heads import ProjectorMLP
    from hmmc_tpu.train.checkpoint import _import_mlp

    tin, inner, tout = 8, 16, 8
    tmlp = torch.nn.Sequential()  # reference MLP num_layers=2 structure
    lin1 = torch.nn.Linear(tin, inner)
    bn = torch.nn.BatchNorm1d(inner)
    lin2 = torch.nn.Linear(inner, tout)
    with torch.no_grad():
        bn.running_mean.copy_(torch.tensor(_randf(inner)))
        bn.running_var.copy_(torch.tensor(np.abs(_randf(inner)) + 1.0))
    x = _randf(6, tin)
    ref = lin2(torch.relu(bn.eval()(lin1(torch.tensor(x)))))
    ref = ref.detach().numpy()

    sd = {
        "p.linear_hidden.1.weight": lin1.weight.detach().numpy(),
        "p.linear_hidden.1.bias": lin1.bias.detach().numpy(),
        "p.linear_hidden.2.weight": bn.weight.detach().numpy(),
        "p.linear_hidden.2.bias": bn.bias.detach().numpy(),
        "p.linear_hidden.2.running_mean": bn.running_mean.numpy(),
        "p.linear_hidden.2.running_var": bn.running_var.numpy(),
        "p.linear_out.weight": lin2.weight.detach().numpy(),
        "p.linear_out.bias": lin2.bias.detach().numpy(),
    }
    imported = _import_mlp(sd, "p.", num_layers=2)
    mlp = ProjectorMLP(num_layers=2, in_dim=tin, inner_dim=inner,
                       out_dim=tout)
    ours = mlp.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, imported["params"]),
         "batch_stats": jax.tree_util.tree_map(
             jnp.asarray, imported["batch_stats"])},
        jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_hf_bert_export_import_roundtrip():
    """export_hf_bert -> import_hf_bert reproduces the exact param tree."""
    from hmmc_tpu.models.text import BertEncoder
    from hmmc_tpu.train.checkpoint import export_hf_bert, import_hf_bert

    enc = BertEncoder(vocab_size=64, hidden_size=16, num_layers=2,
                      num_heads=2, intermediate_size=32,
                      max_position_embeddings=24)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), ids)["params"]
    sd = export_hf_bert(jax.tree_util.tree_map(np.asarray, params))
    back = import_hf_bert(sd, "")
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, back))
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-6)
