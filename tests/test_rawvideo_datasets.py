"""MSVD/LSMDC raw-video dataset tests using synthesized mp4s (cv2 writer)."""

import os
import pickle

import numpy as np
import pytest

from hmmc_tpu.data.datasets_rawvideo import LsmdcDataset, MsvdDataset
from hmmc_tpu.data.rawvideo import RawVideoExtractor, slice_frames
from hmmc_tpu.tokenization import ClipTokenizer

cv2 = pytest.importorskip("cv2")


def _write_video(path, n_frames=20, fps=5, size=48):
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    w = cv2.VideoWriter(path, fourcc, fps, (size, size))
    rng = np.random.default_rng(0)
    for i in range(n_frames):
        frame = np.full((size, size, 3), (i * 12) % 255, np.uint8)
        frame[:8, :8] = rng.integers(0, 255, (8, 8, 3))
        w.write(frame)
    w.release()
    return path


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vids")
    for vid in ("vidA", "vidB"):
        _write_video(str(root / f"{vid}.mp4"))
    return str(root)


def test_raw_extractor(video_root):
    ex = RawVideoExtractor(size=32)
    frames = ex.extract(os.path.join(video_root, "vidA.mp4"), sample_fp=1)
    assert frames.ndim == 4 and frames.shape[1:] == (32, 32, 3)
    assert len(frames) >= 2
    rev = RawVideoExtractor.process_frame_order(frames, 1)
    np.testing.assert_array_equal(rev[0], frames[-1])


def test_slice_frames():
    frames = np.arange(10)[:, None, None, None] * np.ones((1, 2, 2, 3))
    head = slice_frames(frames, 4, 0)
    np.testing.assert_array_equal(head[:, 0, 0, 0], [0, 1, 2, 3])
    tail = slice_frames(frames, 4, 1)
    np.testing.assert_array_equal(tail[:, 0, 0, 0], [6, 7, 8, 9])
    uni = slice_frames(frames, 4, 2)
    np.testing.assert_array_equal(uni[:, 0, 0, 0], [0, 3, 6, 9])


def test_msvd_dataset(video_root, tmp_path):
    data = tmp_path / "msvd"
    data.mkdir()
    (data / "test_list.txt").write_text("vidA\nvidB\n")
    captions = {"vidA": [["a", "dog", "runs"], ["dog", "running"]],
                "vidB": [["a", "cat", "sits"]]}
    with open(data / "raw-captions.pkl", "wb") as f:
        pickle.dump(captions, f)
    ds = MsvdDataset(str(data), video_root, "test", ClipTokenizer(),
                     max_words=12, max_frames=3, resolution=32)
    assert len(ds) == 3
    assert ds.cut_off_points == [2, 3]
    s = ds[0]
    assert s["video"].shape == (3, 32, 32, 3)
    assert s["query_ids"].shape == (12,)


def test_lsmdc_dataset(video_root, tmp_path):
    data = tmp_path / "lsmdc"
    data.mkdir()
    rows = ["vidA\t0\t1\t0\t1\tsomeone walks in",
            "vidA\t1\t2\t1\t2\tthey sit down",
            "vidB\t0\t1\t0\t1\ta door opens"]
    (data / "LSMDC16_challenge_1000_publictect.csv").write_text(
        "\n".join(rows))
    ds = LsmdcDataset(str(data), video_root, "test", ClipTokenizer(),
                      max_words=12, max_frames=3, resolution=32)
    assert len(ds) == 3
    assert ds.cut_off_points == [2, 3]
    s = ds[2]
    assert s["video"].shape == (3, 32, 32, 3)
