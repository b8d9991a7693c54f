"""Minimal text->video retrieval server.

Loads a checkpoint + a ``--do_extract`` feature bank, keeps the text
encoder resident (jitted once), and answers queries over HTTP:

  POST /search   {"text": "a dog catches a frisbee", "topk": 5}
      -> {"results": [{"video_id": ..., "score": ...}, ...],
          "latency_ms": ...}
  GET  /healthz  -> {"ok": true, "videos": N}

The video side is precomputed (the bank); per-query work is one
tokenize + one jitted text-tower forward + one [1, H] x [H, V] matmul —
the serving decomposition the two-phase evaluator already uses
(eval_epoch phase 1/2, main_task_retrieval.py:383-519).

  python tools/serve.py --features out/features.npz --cross_model ... \
      [--init_model ckpt] [--clip_model ViT-B-32.pt] [--port 8765]

Programmatic use: ``RetrievalService`` (used by the tests; the HTTP layer
is a thin wrapper around it).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class RetrievalService:
    def __init__(self, args):
        import jax

        from hmmc_tpu import factory
        from hmmc_tpu.cli import make_tokenizer, to_task_config
        from hmmc_tpu.config import load_cross_config
        from tools.retrieve import _norm

        task = to_task_config(args)
        cross = load_cross_config(task.cross_model)
        if not task.image_resolution:
            from hmmc_tpu.config import ClipArch

            task = task.replace(image_resolution=ClipArch.by_name(
                cross.pretrained_clip_name).image_resolution)
        self.task = task
        self.tokenizer = make_tokenizer(task)
        self.model, variables = factory.build_model(
            task, cross, vocab_size=self.tokenizer.vocab_size,
            clip_model_path=args.clip_model, init_model_path=task.init_model)
        # build_model returns HOST numpy params; pin to device once or
        # every query's text-tower call re-uploads the full weights
        # (~600 MB for ViT-B/32 — measured 10 s/query through the tunnel
        # vs ~30 ms with resident params)
        self.params = jax.device_put(variables["params"])

        from hmmc_tpu.ops.quant import dequantize_bank

        # int8 banks (--quantize_bank int8) are dequantized at load: this
        # host server ranks in numpy, so the int8 win here is the 4x
        # smaller artifact; device-side s8 ranking lives in
        # ops/quant.int8_rank (tools/bench_serving.py measures it).
        bank = dequantize_bank(dict(np.load(args.features,
                                            allow_pickle=False)))
        self.scale = float(bank["logit_scale"])
        self.video = _norm(bank["video"].astype(np.float32))
        self.video_ids = [str(v) for v in bank["video_ids"]] \
            if "video_ids" in bank else [str(i) for i in range(len(self.video))]
        # Frame top-k and title terms: serve ranks with exactly the
        # composition --do_eval / tools/retrieve.py use on the same bank
        # (similarity_from_bank), so a served top-k never disagrees with
        # offline retrieval for the same checkpoint. Normalized once here;
        # per query each term is one matmul over the precomputed bank.
        self.frames = None
        self.top_frames = 0
        if bool(bank.get("use_frame_fea", False)) and "frames" in bank:
            self.frames = _norm(bank["frames"].astype(np.float32))  # [V,F,H]
            self.top_frames = min(int(bank["top_frames"]),
                                  self.frames.shape[1])
        self.title = None
        self.weight_title = 0.0
        if "title" in bank:
            self.title = _norm(bank["title"].astype(np.float32))
            self.weight_title = float(bank.get("weight_title", 0.5))

        import jax.numpy as jnp

        def encode(params, ids, mask):
            q = self.model.apply({"params": params}, ids, mask,
                                 method="encode_text")
            return q / jnp.linalg.norm(q, axis=-1, keepdims=True)

        self._encode = jax.jit(encode)

        # --device_rank: keep the (normalized) bank resident on the
        # accelerator as int8 + per-row scales and compose the same score
        # on device (quant.int8_rank/int8_frame_rank + approx top-k) —
        # the index-scale path measured in tools/bench_serving.py. Host
        # numpy ranking stays the default (exact fp32 on the dequantized
        # bank); at small V the matmul is trivial either way.
        self._device = None
        if getattr(args, "device_rank", False):
            from hmmc_tpu.ops import quant

            dev = {"video": tuple(map(jnp.asarray,
                                      quant.quantize_rows_np(self.video)))}
            if self.frames is not None:
                dev["frames"] = tuple(map(
                    jnp.asarray, quant.quantize_rows_np(self.frames)))
            if self.title is not None:
                dev["title"] = tuple(map(
                    jnp.asarray, quant.quantize_rows_np(self.title)))

            scale, top_frames, w_title = (
                self.scale, self.top_frames, self.weight_title)

            def rank(q, bank, topk):
                sim = scale * quant.int8_rank(q, *bank["video"])
                if "frames" in bank:
                    fl = scale * quant.int8_frame_rank(q, *bank["frames"])
                    top = jax.lax.top_k(fl, top_frames)[0]
                    sim = sim + jnp.mean(top, axis=-1)
                if "title" in bank:
                    sim = sim + w_title * scale * quant.int8_rank(
                        q, *bank["title"])
                k = min(topk, sim.shape[-1])
                return jax.lax.approx_max_k(sim, k, recall_target=0.95)

            self._rank = jax.jit(rank, static_argnums=2)
            self._bank_dev = dev
            self._device = True

        # warm the compile so the first query isn't a compile
        self.search("warmup query")

    def score(self, q: np.ndarray) -> np.ndarray:
        """[V] logits for one normalized query vector — the same
        composition retrieve.similarity_from_bank applies to the full
        bank (loose sim + top-k frame logits + weighted title term)."""
        sim = self.scale * (self.video @ q)
        if self.frames is not None:
            # top-k frame logits, mean over the k best frames per video
            # (main_task_retrieval.py:332-336)
            fl = self.scale * (self.frames @ q)          # [V, F]
            top = np.sort(fl, axis=-1)[:, -self.top_frames:]
            sim = sim + top.mean(axis=-1)
        if self.title is not None:
            sim = sim + self.weight_title * self.scale * (self.title @ q)
        return sim

    def search(self, text: str, topk: int = 5):
        from hmmc_tpu.data.text import encode_text

        t0 = time.perf_counter()
        ids, mask = encode_text(self.tokenizer, text, self.task.max_words,
                                self.task.language)
        qdev = self._encode(self.params, ids[None], mask[None])
        if self._device:
            scores, idx = self._rank(qdev, self._bank_dev, int(topk))
            scores = np.asarray(scores)[0]
            order = np.asarray(idx)[0]
        else:
            sim = self.score(np.asarray(qdev)[0])
            order = np.argsort(-sim)[:topk]
            scores = sim[order]
        latency = (time.perf_counter() - t0) * 1e3
        return {
            "results": [{"video_id": self.video_ids[i],
                         "score": round(float(s), 4)}
                        for i, s in zip(order, scores)],
            "latency_ms": round(latency, 2),
        }


def make_server(service: RetrievalService, port: int):
    """Build the HTTP server (port 0 = auto-assign; the bound port is
    ``httpd.server_address[1]``)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True,
                                  "videos": len(service.video_ids)})
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/search":
                return self._reply(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                out = service.search(str(req["text"]),
                                     int(req.get("topk", 5)))
                self._reply(200, out)
            except Exception as e:  # surface errors as json, keep serving
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, *a):
            pass

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def serve(service: RetrievalService, port: int):
    httpd = make_server(service, port)
    print(f"serving on http://127.0.0.1:{httpd.server_address[1]} "
          f"({len(service.video_ids)} videos)", flush=True)
    httpd.serve_forever()


def main():
    from hmmc_tpu.cli import get_args

    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--features", required=True)
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--device_rank", action="store_true",
                   help="rank on the accelerator with the int8 bank "
                        "kernels + approx top-k (index-scale serving)")
    known, rest = p.parse_known_args()
    # reuse the standard flag surface for model construction
    args = get_args("HMMC-TPU retrieval server",
                    argv=rest + ["--do_eval"]
                    + ([] if "--output_dir" in rest
                       else ["--output_dir", "/tmp/hmmc_serve"]))
    args.features = known.features
    args.device_rank = known.device_rank
    serve(RetrievalService(args), known.port)


if __name__ == "__main__":
    main()
