"""Offline retrieval over a feature bank produced by ``--do_extract``.

Composes the similarity exactly like eval_epoch's phase 2
(main_task_retrieval.py:443-519): ``loose_similarity(q, v)`` plus the
top-k-frame logits when the bank was extracted with ``--use_frame_fea``,
then prints the top-k video ids per query (or the rank metrics with
``--metrics``, reproducing ``--do_eval`` from the bank alone).

  python tools/retrieve.py --features out/features.npz --topk 5
  python tools/retrieve.py --features out/features.npz --metrics
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm(x: np.ndarray) -> np.ndarray:
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def similarity_from_bank(bank) -> np.ndarray:
    """[Q, V] logits from a features.npz bank (loose_similarity +
    optional top-k frame logits, modeling.py:207-229 +
    main_task_retrieval.py:332-336). Accepts int8-quantized banks
    (--quantize_bank int8): the video side is dequantized before the
    same composition, so quantized and float banks rank identically up
    to the quantization error."""
    from hmmc_tpu.ops.quant import dequantize_bank

    bank = dequantize_bank(bank)
    scale = float(bank["logit_scale"])
    sim = scale * (_norm(bank["query"]) @ _norm(bank["video"]).T)
    if bool(bank.get("use_frame_fea", False)):
        fn = _norm(bank["frames"])                       # [V, F, H]
        fl = scale * np.einsum("qh,vfh->qvf", _norm(bank["query"]), fn)
        k = min(int(bank["top_frames"]), fl.shape[-1])
        top = np.sort(fl, axis=-1)[..., -k:]
        sim = sim + top.mean(axis=-1)
    if "title" in bank:
        # retrieval_VT: mix query-vs-title similarity
        # (main_task_retrieval.py:516-518)
        sim_title = scale * (_norm(bank["query"]) @ _norm(bank["title"]).T)
        sim = sim + float(bank.get("weight_title", 0.5)) * sim_title
    return sim


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--features", required=True)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--metrics", action="store_true",
                   help="print rank metrics instead of per-query top-k")
    args = p.parse_args()

    bank = dict(np.load(args.features, allow_pickle=False))
    sim = similarity_from_bank(bank)

    if args.metrics:
        import logging

        from hmmc_tpu.metrics import logging_rank

        multi = bool(bank.get("multi_sentence", False))
        cut_off = list(bank.get("cut_off_points", []))
        m = logging_rank(sim, multi, cut_off, logging.getLogger("retrieve"))
        print(json.dumps({k: float(v) for k, v in m.items()}))
        return

    ids = bank.get("video_ids")
    order = np.argsort(-sim, axis=1)[:, :args.topk]
    for qi, row in enumerate(order):
        hits = [str(ids[v]) if ids is not None else int(v) for v in row]
        scores = [round(float(sim[qi, v]), 3) for v in row]
        print(json.dumps({"query": qi, "topk": hits, "scores": scores}))


if __name__ == "__main__":
    main()
