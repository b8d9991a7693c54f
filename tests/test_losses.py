"""Loss parity tests. Where practical, the expected values are computed with
an independent torch implementation of the reference formulas (written here
from the documented behavior, not copied), so the jnp versions are checked
against a second implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from hmmc_tpu import losses

rng = np.random.default_rng(0)


def test_cross_en_matches_torch():
    sim = rng.normal(size=(8, 8)).astype(np.float32)
    ours = losses.cross_en(jnp.asarray(sim))
    logpt = F.log_softmax(torch.tensor(sim), dim=-1)
    ref = -torch.diag(logpt).mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_dual_cross_en_matches_torch():
    sim = rng.normal(size=(6, 6)).astype(np.float32)
    ours = losses.dual_cross_en(jnp.asarray(sim))
    t = torch.tensor(sim)
    alpha = F.softmax(t, dim=0)
    beta = F.softmax(t, dim=1)
    m = t * alpha * beta
    ref = -torch.diag(F.log_softmax(m, dim=-1)).mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_moco_contrastive_matches_torch():
    B, H, K = 4, 16, 32
    q = rng.normal(size=(B, H)).astype(np.float32)
    k = rng.normal(size=(B, H)).astype(np.float32)
    queue = rng.normal(size=(H, K)).astype(np.float32)
    queue /= np.linalg.norm(queue, axis=0, keepdims=True)
    T = 0.07
    ours = losses.moco_contrastive(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(queue), T)

    tq = F.normalize(torch.tensor(q), dim=1)
    tk = F.normalize(torch.tensor(k), dim=1)
    l_pos = torch.diag(tq @ tk.T).reshape(B, 1)
    l_neg = tq @ torch.tensor(queue)
    logits = torch.cat([l_pos, l_neg], dim=1) / T
    ref = F.cross_entropy(logits, torch.zeros(B, dtype=torch.long))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_frame_self_loss_matches_loop():
    """Vectorized FAM == the reference's Python-loop formulation."""
    B, Fr, H, K = 3, 5, 8, 16
    pred = jnp.asarray(rng.normal(size=(B, Fr, H)).astype(np.float32))
    proj_k = jnp.asarray(rng.normal(size=(B, Fr, H)).astype(np.float32))
    queue = rng.normal(size=(H, K)).astype(np.float32)
    queue /= np.linalg.norm(queue, axis=0, keepdims=True)
    queue = jnp.asarray(queue)
    T = 0.07
    ours = losses.frame_self_loss(pred, proj_k, queue, T)
    loop = 0.0
    for i in range(Fr - 1):
        loop += float(losses.moco_contrastive(
            pred[:, i], proj_k[:, i + 1], queue, T))
        loop += float(losses.moco_contrastive(
            pred[:, i + 1], proj_k[:, i], queue, T))
    loop /= (Fr - 1)
    np.testing.assert_allclose(float(ours), loop, rtol=1e-5)


def test_frame_cross_loss_matches_loop():
    B, Fr, H, K = 3, 4, 8, 16
    frame = jnp.asarray(rng.normal(size=(B, Fr, H)).astype(np.float32))
    frame_k = jnp.asarray(rng.normal(size=(B, Fr, H)).astype(np.float32))
    text = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    text_k = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    qf = rng.normal(size=(H, K)).astype(np.float32)
    qf /= np.linalg.norm(qf, axis=0, keepdims=True)
    qt = rng.normal(size=(H, K)).astype(np.float32)
    qt /= np.linalg.norm(qt, axis=0, keepdims=True)
    qf, qt = jnp.asarray(qf), jnp.asarray(qt)
    T = 0.07
    ours = losses.frame_cross_loss(frame, frame_k, qf, text, text_k, qt, T)
    loop = 0.0
    for i in range(Fr):
        loop += float(losses.moco_contrastive(text, frame_k[:, i], qf, T))
        loop += float(losses.moco_contrastive(frame[:, i], text_k, qt, T))
    loop /= Fr
    np.testing.assert_allclose(float(ours), loop, rtol=1e-5)


def test_loose_similarity_2d_and_3d():
    Bq, Bv, Fr, H = 4, 5, 3, 8
    s = rng.normal(size=(Bq, H)).astype(np.float32)
    v2 = rng.normal(size=(Bv, H)).astype(np.float32)
    v3 = rng.normal(size=(Bv, Fr, H)).astype(np.float32)
    scale = jnp.float32(100.0)
    out2 = losses.loose_similarity(jnp.asarray(s), jnp.asarray(v2), scale)
    assert out2.shape == (Bq, Bv)
    sn = s / np.linalg.norm(s, axis=-1, keepdims=True)
    vn = v2 / np.linalg.norm(v2, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out2), 100 * sn @ vn.T, rtol=1e-4)

    out3 = losses.loose_similarity(jnp.asarray(s), jnp.asarray(v3), scale)
    # reference 3-D branch returns [Bq, Bv, F] after its permute(1,0,2)
    assert out3.shape == (Bq, Bv, Fr)
    v3n = v3 / np.linalg.norm(v3, axis=-1, keepdims=True)
    expect = 100 * np.einsum("vfh,qh->qvf", v3n, sn)
    np.testing.assert_allclose(np.asarray(out3), expect, rtol=1e-4)
    # torch cross-check of the permute semantics
    tm = torch.matmul(torch.tensor(sn), torch.tensor(v3n).permute(0, 2, 1))
    tm = (100 * tm).permute(1, 0, 2)
    np.testing.assert_allclose(np.asarray(out3), tm.numpy(), rtol=1e-4)


def test_finetune_retrieval_loss_gradients_flow():
    Bq, Fr, H = 6, 4, 8
    q = jnp.asarray(rng.normal(size=(Bq, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(Bq, H)).astype(np.float32))
    f = jnp.asarray(rng.normal(size=(Bq, Fr, H)).astype(np.float32))

    def loss(q):
        return losses.finetune_retrieval_loss(
            q, v, f, jnp.float32(100.0), 0.85, 0.15)["loss"]

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
    out = losses.finetune_retrieval_loss(
        q, v, None, jnp.float32(100.0), 0.85, 0.15)
    assert float(out["frame_loss"]) == 0.0


def test_milnce_and_max_margin_run():
    s = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
    l1 = losses.milnce(s, batch_size=4, n_pair=2)
    l2 = losses.max_margin_ranking(s)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
