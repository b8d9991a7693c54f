"""Metric tests against hand-computed ranks (reference: metrics.py)."""

import numpy as np

from hmmc_tpu.metrics import (
    compute_metrics, logging_rank, pad_multi_sentence,
    text_to_video_metrics_3d, video_to_text_sim)


def test_compute_metrics_perfect():
    sim = np.eye(10) * 2 + np.random.RandomState(0).rand(10, 10) * 0.1
    m = compute_metrics(sim)
    assert m["R1"] == 100.0 and m["R5"] == 100.0 and m["R10"] == 100.0
    assert m["MR"] == 1.0 and m["MeanR"] == 1.0


def test_compute_metrics_known_ranks():
    # query 0's target ranks 1st, query 1's ranks 3rd, query 2's ranks 2nd
    sim = np.array([
        [9.0, 1.0, 2.0],
        [5.0, 3.0, 4.0],
        [1.0, 8.0, 7.0],
    ])
    m = compute_metrics(sim)
    # ranks (0-based): 0, 2, 1 -> R1 = 1/3, R5 = 3/3
    assert abs(m["R1"] - 100 / 3) < 1e-9
    assert m["R5"] == 100.0
    assert m["MR"] == 2.0
    assert abs(m["MeanR"] - 2.0) < 1e-9


def test_multi_sentence_grouping():
    # 5 sentences over 3 videos; cut_off_points are the inclusive index of
    # each video's last sentence: [1, 2, 4]
    rng = np.random.RandomState(1)
    sim = rng.rand(5, 3)
    # make each sentence's own video the best match
    owners = [0, 0, 1, 2, 2]
    for i, v in enumerate(owners):
        sim[i, v] = 10.0
    sim3d = pad_multi_sentence(sim, [1, 2, 4])
    assert sim3d.shape == (3, 2, 3)
    tv = text_to_video_metrics_3d(sim3d)
    assert tv["R1"] == 100.0
    vt = compute_metrics(video_to_text_sim(sim3d))
    assert vt["R1"] == 100.0


def test_logging_rank_single(caplog):
    sim = np.eye(4) + 0.01
    out = logging_rank(sim, False, [])
    assert out["R1"] == 100.0
    assert "v2t_R1" in out
