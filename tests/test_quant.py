"""int8 feature-bank quantization (hmmc_tpu/ops/quant.py).

Covers: absmax round-trip error bounds, the device s8 ranking kernels
against fp32 references, and end-to-end bank quantize -> npz -> retrieve
parity (rankings and rank metrics unchanged)."""

import io
import logging

import numpy as np

from hmmc_tpu.ops import quant


def _normed(rng, shape):
    x = rng.normal(size=shape).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = _normed(rng, (64, 128))
    q, scale = quant.quantize_rows_np(x)
    assert q.dtype == np.int8 and scale.dtype == np.float32
    deq = quant.dequantize_np(q, scale)
    # symmetric rounding: per-element error <= scale/2 = absmax/254
    bound = (np.abs(x).max(axis=-1) / 254.0 + 1e-7)[:, None]
    assert (np.abs(deq - x) <= bound).all()


def test_roundtrip_3d_frames():
    rng = np.random.default_rng(1)
    x = _normed(rng, (6, 4, 32))
    q, scale = quant.quantize_rows_np(x)
    assert q.shape == x.shape and scale.shape == (6, 4)
    np.testing.assert_allclose(quant.dequantize_np(q, scale), x, atol=1e-2)


def test_int8_rank_matches_fp32():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    bank = _normed(rng, (40, 64))
    # queries = noisy copies of bank rows -> unambiguous top-1
    q = _normed(rng, (40, 64)) * 0.05 + bank
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)

    bq, bs = quant.quantize_rows_np(bank)
    sim8 = np.asarray(quant.int8_rank(
        jnp.asarray(q), jnp.asarray(bq), jnp.asarray(bs)))
    sim32 = q @ bank.T
    # both sides quantized: |err| <~ 2*sqrt(H)/254 = 0.063 at H=64
    np.testing.assert_allclose(sim8, sim32, atol=0.1)
    # the separable construction must survive quantization exactly
    assert (sim8.argmax(axis=1) == np.arange(40)).all()


def test_int8_frame_rank_matches_fp32():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    frames = _normed(rng, (10, 4, 32))
    q = _normed(rng, (7, 32))
    fq, fs = quant.quantize_rows_np(frames)
    out = np.asarray(quant.int8_frame_rank(
        jnp.asarray(q), jnp.asarray(fq), jnp.asarray(fs)))
    ref = np.einsum("qh,vfh->qvf", q, frames)
    assert out.shape == (7, 10, 4)
    np.testing.assert_allclose(out, ref, atol=0.08)


def test_device_quantize_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    x = _normed(rng, (16, 48))
    qh, sh = quant.quantize_rows_np(x)
    qd, sd = quant.quantize_rows(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(sd), sh, rtol=1e-6)
    # rint vs round can differ only at exact .5 boundaries; random floats
    # never sit there
    np.testing.assert_array_equal(np.asarray(qd), qh)


def _synthetic_bank(rng, n=12, h=24, f=4):
    video = _normed(rng, (n, h))
    query = video + 0.05 * _normed(rng, (n, h))
    query = query / np.linalg.norm(query, axis=-1, keepdims=True)
    frames = _normed(rng, (n, f, h))
    frames[np.arange(n), 0] = video  # best frame = the video itself
    return {
        "query": query.astype(np.float32),
        "video": video.astype(np.float32),
        "frames": frames.astype(np.float32),
        "logit_scale": np.float32(50.0),
        "multi_sentence": np.bool_(False),
        "cut_off_points": np.asarray([], np.int64),
        "top_frames": np.int32(2),
        "use_frame_fea": np.bool_(True),
        "title": _normed(rng, (n, h)).astype(np.float32),
        "weight_title": np.float32(0.5),
    }


def test_bank_npz_roundtrip_and_retrieve_parity():
    """quantize_bank -> np.savez -> load -> similarity_from_bank ranks
    identically to the float bank (and the metrics agree exactly on a
    separable synthetic set)."""
    from hmmc_tpu.metrics import logging_rank
    from tools.retrieve import similarity_from_bank

    rng = np.random.default_rng(5)
    bank = _synthetic_bank(rng)
    qbank = quant.quantize_bank(bank)
    assert qbank["video"].dtype == np.int8
    assert qbank["frames"].dtype == np.int8
    assert qbank["title"].dtype == np.int8
    assert str(qbank[quant.QUANT_KEY]) == "int8"

    buf = io.BytesIO()
    np.savez(buf, **qbank)
    buf.seek(0)
    loaded = dict(np.load(buf, allow_pickle=False))

    sim_f = similarity_from_bank(bank)
    sim_q = similarity_from_bank(loaded)
    # ~2.5 quantized terms x scale*sqrt(H)/254 ~= 2.4 at scale 50, H=24
    np.testing.assert_allclose(sim_q, sim_f, atol=4.0)
    assert (sim_q.argmax(axis=1) == sim_f.argmax(axis=1)).all()

    log = logging.getLogger("quant-test")
    m_f = logging_rank(sim_f, False, [], log)
    m_q = logging_rank(sim_q, False, [], log)
    for k in ("R1", "R5", "R10", "MR", "MeanR"):
        np.testing.assert_allclose(m_q[k], m_f[k], atol=1e-6, err_msg=k)


def test_dequantize_bank_passthrough_for_float_banks():
    rng = np.random.default_rng(6)
    bank = _synthetic_bank(rng)
    out = quant.dequantize_bank(bank)
    assert out["video"].dtype == np.float32
    np.testing.assert_array_equal(out["video"], bank["video"])
