"""Device RandAugment op tests."""

import jax
import jax.numpy as jnp
import numpy as np

from hmmc_tpu.ops import randaugment as ra


def _img(key=0, h=24, w=24):
    return jax.random.uniform(jax.random.PRNGKey(key), (h, w, 3))


def test_identity_ops_preserve():
    img = _img()
    np.testing.assert_allclose(
        np.asarray(ra.rotate(img, jnp.float32(0.0))), np.asarray(img),
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ra.shear_x(img, jnp.float32(0.0))), np.asarray(img),
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ra.translate_y(img, jnp.float32(0.0))), np.asarray(img),
        atol=1e-5)


def test_rotate_90_roundtrip_square():
    img = _img(1)
    r = ra.rotate(img, jnp.float32(90.0))
    r4 = r
    for _ in range(3):
        r4 = ra.rotate(r4, jnp.float32(90.0))
    # 4x90 degrees returns the original (interior pixels; borders interp)
    inner = (slice(4, -4), slice(4, -4))
    np.testing.assert_allclose(np.asarray(r4[inner]),
                               np.asarray(img[inner]), atol=0.05)


def test_translate_moves_content():
    img = jnp.zeros((16, 16, 3)).at[8, 8].set(1.0)
    t = ra.translate_x(img, jnp.float32(-3.0))  # inverse map: shifts right
    assert float(t[8, 11, 0]) > 0.9
    assert float(t[8, 8, 0]) < 0.1


def test_solarize_posterize_ranges():
    img = _img(2)
    s = ra.solarize(img, jnp.float32(0.5))
    assert float(jnp.min(s)) >= 0 and float(jnp.max(s)) <= 1
    p = ra.posterize(img, jnp.float32(4.0))
    # 4 bits -> at most 16 distinct values per channel
    vals = np.unique(np.round(np.asarray(p[..., 0]) * 255).astype(int))
    assert len(vals) <= 17


def test_autocontrast_stretches():
    img = _img(3) * 0.4 + 0.3  # compressed range
    out = ra.autocontrast(img)
    assert float(jnp.min(out)) < 0.01 and float(jnp.max(out)) > 0.99


def test_equalize_flattens_histogram():
    img = jnp.clip(_img(4) ** 3, 0, 1)  # skewed distribution
    out = ra.equalize(img)
    assert out.shape == img.shape
    # equalized mean should move toward 0.5 vs the skewed input
    assert abs(float(jnp.mean(out)) - 0.5) < abs(float(jnp.mean(img)) - 0.5)


def test_randaugment_batched_deterministic():
    imgs = jax.random.uniform(jax.random.PRNGKey(5), (4, 24, 24, 3))
    key = jax.random.PRNGKey(0)
    a = ra.randaugment(key, imgs, n_ops=2, magnitude=10)
    b = ra.randaugment(key, imgs, n_ops=2, magnitude=10)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert a.shape == imgs.shape
    c = ra.randaugment(jax.random.PRNGKey(1), imgs)
    assert not np.allclose(np.asarray(a), np.asarray(c))
    assert np.isfinite(np.asarray(a)).all()


def test_prepare_pretrain_batch_randaugment_wiring():
    """--use_randaugment stacks RandAugment on the pretrain SimCLR aug
    (opt-in wiring of the reference's dormant RandomAugment import)."""
    import jax

    from hmmc_tpu.runner import _prepare_pretrain_batch

    rng = np.random.default_rng(0)
    batch = {
        "video": rng.integers(0, 255, size=(2, 3, 36, 36, 3)).astype(
            np.uint8),
        "title_ids": np.ones((2, 8), np.int32),
        "title_mask": np.ones((2, 8), np.int32),
    }
    key = jax.random.PRNGKey(0)
    plain = _prepare_pretrain_batch(dict(batch), key, out=32)
    ra = _prepare_pretrain_batch(dict(batch), key, out=32,
                                 randaugment=(2, 10))
    assert ra["video"].shape == plain["video"].shape == (2, 3, 32, 32, 3)
    v = np.asarray(ra["video"])
    assert np.isfinite(v).all()
    # the same rng produces the same SimCLR base, so any difference is
    # RandAugment actually applying
    assert not np.allclose(v, np.asarray(plain["video"]))
