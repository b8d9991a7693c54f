"""FramePack container, frame sampling, and device-side image op tests."""

import io
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from hmmc_tpu.data.framepack import (
    FramePackReader, FramePackWriter, open_frame_store)
from hmmc_tpu.data.sampling import dynamic_frame_count, sample_frame_indices
from hmmc_tpu.ops import image_ops


def _jpeg(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def test_framepack_roundtrip(tmp_path):
    path = str(tmp_path / "pack.fpk")
    rng = np.random.default_rng(0)
    vids = {f"vid{i}": [
        _jpeg(rng.integers(0, 255, size=(32, 48, 3), dtype=np.uint8))
        for _ in range(4)] for i in range(3)}
    with FramePackWriter(path) as w:
        for vid, frames in vids.items():
            w.add_video(vid, frames)
        w.set_metadata(frames_per_video=4, store_size=32)

    r = FramePackReader(path)
    assert set(r.video_ids()) == set(vids)
    assert r.metadata["frames_per_video"] == 4
    for vid, frames in vids.items():
        assert r.num_frames(vid) == 4
        for i, blob in enumerate(frames):
            assert bytes(r.get_frame(vid, i)) == blob
        got = r.get_frames(vid, [3, 0])
        assert bytes(got[0]) == frames[3] and bytes(got[1]) == frames[0]
    # open_frame_store auto-detects the magic
    r2 = open_frame_store(path)
    assert isinstance(r2, FramePackReader)


def test_framepack_rejects_duplicates(tmp_path):
    path = str(tmp_path / "pack.fpk")
    with FramePackWriter(path) as w:
        w.add_video("a", [b"x"])
        with pytest.raises(ValueError):
            w.add_video("a", [b"y"])


def test_sample_frame_indices():
    # uniform matches np.linspace endpoint=False (reference behavior)
    np.testing.assert_array_equal(
        sample_frame_indices(30, 12, "uniform"),
        np.linspace(0, 30, 12, endpoint=False, dtype=int))
    rng = np.random.default_rng(0)
    r = sample_frame_indices(30, 12, "random", rng)
    assert len(r) == 12 and (np.diff(r) > 0).all() and r.max() < 30
    ur = sample_frame_indices(30, 10, "uniform_random", rng)
    for i, v in enumerate(ur):  # one per stratum of size 3
        assert 3 * i <= v < 3 * (i + 1)
    # degenerate: want > stored clamps
    d = sample_frame_indices(5, 8, "uniform")
    assert len(d) == 8 and d.max() < 5


def test_dynamic_frame_count():
    assert dynamic_frame_count(5, 12) == 3     # floor(1.5) < 3 -> 3
    assert dynamic_frame_count(20, 12) == 6
    assert dynamic_frame_count(100, 12) == 12  # clamped


def test_eval_preprocess_shapes_and_range():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, size=(2, 3, 64, 80, 3), dtype=np.uint8)
    out = image_ops.finetune_preprocess(jnp.asarray(frames), resolution=32)
    assert out.shape == (2, 3, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    # normalization: a mid-gray image maps near (0.5-mean)/std
    gray = np.full((1, 1, 40, 40, 3), 128, np.uint8)
    g = np.asarray(image_ops.finetune_preprocess(jnp.asarray(gray), 32))
    expect = (128 / 255 - np.array(image_ops.CLIP_MEAN)) / np.array(
        image_ops.CLIP_STD)
    np.testing.assert_allclose(g[0, 0, 16, 16], expect, atol=0.05)


def test_center_crop_matches_torchvision_convention():
    x = jnp.arange(5 * 6 * 1, dtype=jnp.float32).reshape(1, 5, 6, 1)
    c = image_ops.center_crop(x, 3)
    assert c.shape == (1, 3, 3, 1)
    np.testing.assert_array_equal(
        np.asarray(c[0, :, :, 0]), np.asarray(x[0, 1:4, 1:4, 0]))


def test_simclr_augment_shapes_and_determinism():
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, size=(4, 64, 64, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(0)
    a1 = image_ops.simclr_augment(key, jnp.asarray(frames), out=32)
    a2 = image_ops.simclr_augment(key, jnp.asarray(frames), out=32)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
    assert a1.shape == (4, 32, 32, 3)
    a3 = image_ops.simclr_augment(jax.random.PRNGKey(1),
                                  jnp.asarray(frames), out=32)
    assert not np.allclose(np.asarray(a1), np.asarray(a3))


def test_random_resized_crop_bounds():
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((3, 50, 70, 3), jnp.float32)
    out = image_ops.random_resized_crop(rng, x, out=24)
    assert out.shape == (3, 24, 24, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_color_ops_stay_in_range():
    rng = jax.random.PRNGKey(3)
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 16, 16, 3))
    y = image_ops.color_jitter(rng, x)
    assert float(jnp.min(y)) >= -1e-6 and float(jnp.max(y)) <= 1 + 1e-6
    g = image_ops.random_grayscale(rng, x, p=1.0)
    # grayscale: channels equal
    np.testing.assert_allclose(
        np.asarray(g[..., 0]), np.asarray(g[..., 1]), atol=1e-6)


def test_hue_identity():
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 8, 8, 3))
    y = image_ops.adjust_hue(x, jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_gaussian_blur_smooths():
    rng = jax.random.PRNGKey(6)
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 32, 32, 3))
    y = image_ops.gaussian_blur(rng, x, sigma_range=(2.0, 2.0))
    assert float(jnp.var(y)) < float(jnp.var(x))
    assert y.shape == x.shape


def test_corrupt_frame_zero_filled():
    from hmmc_tpu.data.datasets import _decode_aug, _decode_eval

    bad = b"definitely not a jpeg"
    out = _decode_eval(bad, 16)
    assert out.shape == (16, 16, 3) and out.sum() == 0
    out = _decode_aug(bad, 16)
    assert out.shape == (16, 16, 3) and out.sum() == 0


# ---------------------------------------------------------------------------
# multi-host process sharding (DistributedSampler semantics,
# dataloaders/dataloader.py:14)
# ---------------------------------------------------------------------------

class _IdxDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"idx": np.int64(i)}


def test_process_sharded_loader_disjoint_and_complete():
    """Two simulated processes each load a disjoint contiguous half of
    every global batch; the halves concatenate (in process order) to
    exactly the single-process global batch, so a jitted train step over
    jax.make_array_from_process_local_data sees the identical global
    array."""
    from hmmc_tpu.data.loader import BatchLoader

    n, bs = 22, 8  # batches of 8, 8, 6 (last one wrap-padded to 8)
    mk = lambda p, c: BatchLoader(
        _IdxDataset(n), batch_size=bs, shuffle=True, num_workers=1,
        seed=3, process_index=p, process_count=c)
    for epoch in (0, 1):
        g, l0, l1 = mk(0, 1), mk(0, 2), mk(1, 2)
        for ld in (g, l0, l1):
            ld.set_epoch(epoch)
        gb = [b["idx"] for b in g]
        b0 = [b["idx"] for b in l0]
        b1 = [b["idx"] for b in l1]
        assert len(gb) == len(b0) == len(b1) == 3
        for i, (bg, s0, s1) in enumerate(zip(gb, b0, b1)):
            cat = np.concatenate([s0, s1])
            if len(bg) % 2 == 0:
                np.testing.assert_array_equal(cat, bg)
                assert not set(s0.tolist()) & set(s1.tolist())
            else:
                # wrap-padded final batch: global rows + duplicated head
                need = 2 - len(bg) % 2
                np.testing.assert_array_equal(
                    cat, np.concatenate([bg, bg[:need]]))


def test_process_count_must_divide_batch():
    from hmmc_tpu.data.loader import BatchLoader

    with np.testing.assert_raises(ValueError):
        BatchLoader(_IdxDataset(8), batch_size=9, process_index=0,
                    process_count=2)


def test_bundled_vatex_manifests_present():
    """The reference ships its VATEX split lists (tools/vatex_txt/); the
    registry falls back to the bundled copies when the data dir lacks
    them. 25,991/1,500/1,500 ids (SURVEY §2 manifest row)."""
    from hmmc_tpu.data.registry import _BUNDLED_VATEX_LISTS

    counts = {"train_list.txt": 25991, "val_list.txt": 1500,
              "test_list.txt": 1500}
    for name, n in counts.items():
        p = os.path.join(_BUNDLED_VATEX_LISTS, name)
        assert os.path.isfile(p), p
        with open(p, encoding="utf-8") as f:
            ids = [l for l in f.read().splitlines() if l]
        assert len(ids) == n, (name, len(ids))


def test_video2framepack_manifest_resolution(tmp_path):
    """Relative manifest paths resolve against --video_root; absolute
    paths and bare id lists keep working (all three manifest shapes)."""
    import json
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.video2framepack import load_manifest

    m1 = tmp_path / "m1.json"
    m1.write_text(json.dumps([{"video_id": "a", "path": "a.mp4"},
                              {"video_id": "b", "path": "/abs/b.mp4"},
                              {"video_id": "c"}]))
    _, items = load_manifest(str(m1), "/root/videos")
    assert dict(items) == {"a": "/root/videos/a.mp4", "b": "/abs/b.mp4",
                           "c": "/root/videos/c.mp4"}

    m2 = tmp_path / "m2.json"
    m2.write_text(json.dumps({"videos": [{"video_id": "x",
                                          "path": "sub/x.mp4"}]}))
    _, items = load_manifest(str(m2), "/vr")
    assert items == [("x", "/vr/sub/x.mp4")]

    m3 = tmp_path / "m3.json"
    m3.write_text(json.dumps(["d.mp4"]))
    _, items = load_manifest(str(m3), "/vr")
    assert items == [("d", "/vr/d.mp4")]


class _SeededDataset(__import__("hmmc_tpu.data.datasets",
                                fromlist=["SeededFrameSampling"]
                                ).SeededFrameSampling):
    """Samples are pure functions of the per-sample seeded rng."""

    def __len__(self):
        return 12

    def __getitem__(self, i):
        return {"draw": self._sample_rng(i).integers(0, 1 << 30, size=4)}


def test_seeded_frame_sampling_reproducible_across_runs_and_workers():
    """--seed reproduces frame sampling end-to-end (VERDICT r2 #8): the
    per-sample (seed, epoch, idx) rng makes loader output independent of
    worker-thread scheduling, reseeded per epoch, and distinct across
    seeds. Reference seeds globally, main_task_retrieval.py:100-110."""
    from hmmc_tpu.data.loader import BatchLoader

    def run(seed, epoch, workers):
        ld = BatchLoader(_SeededDataset(), batch_size=4, shuffle=True,
                         num_workers=workers, seed=seed)
        ld.set_epoch(epoch)
        return [b["draw"] for b in ld]

    a = run(7, 0, workers=1)
    b = run(7, 0, workers=4)
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # different epoch and different seed both change the draws
    c = run(7, 1, workers=1)
    d = run(8, 0, workers=1)
    assert not all(np.array_equal(x, y) for x, y in zip(a, c))
    assert not all(np.array_equal(x, y) for x, y in zip(a, d))


def test_loader_seeds_dataset_without_set_epoch():
    """Epoch-0 sampling is deterministic even when the caller never calls
    set_epoch (eval/one-off loops seed at construction)."""
    from hmmc_tpu.data.loader import BatchLoader

    outs = []
    for _ in range(2):
        ld = BatchLoader(_SeededDataset(), batch_size=4, num_workers=2,
                         seed=5)
        outs.append([b["draw"] for b in ld])
    for x, y in zip(*outs):
        np.testing.assert_array_equal(x, y)
