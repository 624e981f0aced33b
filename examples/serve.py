#!/usr/bin/env python
"""Minimal production-style serving daemon.

The reference is a library + CLI (no daemon); this adds the serving surface a
TPU deployment needs: an OpenAI-style HTTP endpoint with two schedulers:

  --engine continuous (default): slot/iteration-level continuous batching
    (mllm_tpu/generation/engine.py) — new requests join mid-decode, no
    convoy effect;
  --engine window: dynamic micro-batching — requests arriving within a
    window are left-pad batched through one forward and fanned back out.

  python examples/serve.py -m <model_dir> [-p 8000] [--engine continuous]

  curl localhost:8000/v1/completions -d '{"prompt": "hello", "max_tokens": 32}'
  curl localhost:8000/metrics
"""

import argparse
import json
import os
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp


class ContinuousFrontend:
    """Adapter: ContinuousEngine scheduling + serving metrics."""

    def __init__(self, model, tok, cfg, max_len=2048, max_batch=8, kv_dtype="bf16",
                 prefix_cache=0, image_size=None, paged=0):
        from mllm_tpu.generation.engine import ContinuousEngine, collect
        from mllm_tpu.utils.metrics import GLOBAL, GenerationMetrics

        self.tok = tok
        self.cfg = cfg
        self.metrics = GLOBAL
        self.genmetrics = GenerationMetrics(GLOBAL)
        self._collect = collect
        self.engine = ContinuousEngine(model, slots=max_batch, max_len=max_len,
                                       eos_token_id=getattr(tok, "eos_token_id", None),
                                       kv_dtype=kv_dtype, prefix_cache=prefix_cache,
                                       paged=paged)
        self.vl_proc = None
        if hasattr(model, "visual"):  # Qwen2-VL: accept image requests
            from mllm_tpu.processor.image import Qwen2VLImageProcessor
            from mllm_tpu.processor.qwen2_vl import Qwen2VLProcessor

            # fixed serving resolution -> ONE compiled vision/admission
            # program for every request (no per-aspect-ratio recompiles)
            ip = Qwen2VLImageProcessor(
                fixed_resolution=(image_size, image_size) if image_size else None)
            self.vl_proc = Qwen2VLProcessor(
                tok, image_processor=ip,
                image_token_id=model.cfg.image_token_id,
                video_token_id=model.cfg.video_token_id)

    def submit_image(self, text, image, max_tokens, video=None, sampling=None):
        """Multimodal request: PIL image (or a video as a list of frames) +
        prompt through the VL processor, served by the continuous engine in
        shared slots."""
        if self.vl_proc is None:
            raise ValueError("model is not multimodal (no vision tower)")
        if video is not None:
            proc_out = self.vl_proc(self.vl_proc.chat_text(text, video=True),
                                    videos=video)
        else:
            proc_out = self.vl_proc(self.vl_proc.chat_text(text), images=[image])
        n_prompt = int(proc_out.input_ids.shape[1])
        stream = self.engine.submit_vl(proc_out, max_tokens, sampling=sampling)
        return self._drain_to_queue(stream, n_prompt, time.perf_counter()), n_prompt

    def submit(self, prompt_ids, max_tokens, sampling=None):
        t0 = time.perf_counter()
        stream = self.engine.submit(prompt_ids, max_tokens, sampling=sampling)
        return self._drain_to_queue(stream, len(prompt_ids), t0)

    def submit_stream(self, prompt_ids, max_tokens, sampling=None):
        """Raw per-token queue (None sentinel) for SSE streaming."""
        return self.engine.submit(prompt_ids, max_tokens, sampling=sampling)

    def _drain_to_queue(self, stream, n_prompt, t0):
        import queue as _q
        done: _q.Queue = _q.Queue()

        def drain():
            toks = self._collect(stream)
            dt = time.perf_counter() - t0
            active = sum(r is not None for r in self.engine.req)
            self.metrics.set("mllm_last_batch_size", max(active, 1))
            self.metrics.set("mllm_prefix_tokens_reused",
                             self.engine.prefix_tokens_reused)
            self.genmetrics.record(n_prompt, len(toks), dt, dt)
            done.put(toks)

        threading.Thread(target=drain, daemon=True).start()
        return done


class SpeculativeFrontend:
    """Single-stream speculative-decoding scheduler (--engine sd).

    The latency-optimized path: suffix-automaton drafts + one verify
    forward per window (greedy, like the reference's demo_qwen_sd) —
    requests run sequentially, each at SD speed.  Exports the acceptance
    rate as `mllm_sd_acceptance`."""

    def __init__(self, model, tok, cfg, max_len=2048, max_draft=8):
        from mllm_tpu.utils.metrics import GLOBAL, GenerationMetrics

        self.model = model
        self.tok = tok
        self.cfg = cfg
        self.max_len = max_len
        self.max_draft = max_draft
        self.metrics = GLOBAL
        self.genmetrics = GenerationMetrics(GLOBAL)
        self._lock = threading.Lock()

    def _run(self, prompt_ids, max_tokens, cb=None):
        from mllm_tpu.generation.speculative import speculative_generate

        t0 = time.perf_counter()
        with self._lock:  # one stream at a time (latency mode)
            cache = self.model.init_cache(1, self.max_len, jnp.bfloat16)
            toks, _, stats = speculative_generate(
                self.model, np.asarray(prompt_ids, np.int32)[None],
                cache, max_tokens, max_draft=self.max_draft, callback=cb)
        dt = time.perf_counter() - t0
        self.metrics.set("mllm_sd_acceptance", round(float(stats.acceptance), 4))
        self.genmetrics.record(len(prompt_ids), len(toks), dt, dt)
        return toks

    def submit(self, prompt_ids, max_tokens, sampling=None):
        done: queue.Queue = queue.Queue()
        threading.Thread(target=lambda: done.put(self._run(prompt_ids, max_tokens)),
                         daemon=True).start()
        return done

    def submit_stream(self, prompt_ids, max_tokens, sampling=None):
        q: queue.Queue = queue.Queue()

        def run():
            self._run(prompt_ids, max_tokens, cb=q.put)
            q.put(None)

        threading.Thread(target=run, daemon=True).start()
        return q


class Engine:
    """Background batching loop: collects requests, runs ragged batches."""

    def __init__(self, model, tok, cfg, max_len=2048, window_ms=30, max_batch=8):
        self.model = model
        self.tok = tok
        self.cfg = cfg
        self.max_len = max_len
        self.window_ms = window_ms
        self.max_batch = max_batch
        self.q: queue.Queue = queue.Queue()
        from mllm_tpu.utils.metrics import GLOBAL, GenerationMetrics

        self.metrics = GLOBAL
        self.genmetrics = GenerationMetrics(GLOBAL)
        threading.Thread(target=self._loop, daemon=True).start()

    def submit(self, prompt_ids: np.ndarray, max_tokens: int, sampling=None) -> "queue.Queue":
        # window batches share one compiled loop; the batch runs with the
        # FIRST request's sampling config (the continuous engine is the
        # per-request-config path)
        done: queue.Queue = queue.Queue()
        self.q.put((prompt_ids, max_tokens, done, time.perf_counter(), sampling))
        return done

    def _loop(self):
        from mllm_tpu.generation.generate import ragged_batched_generate
        from mllm_tpu.generation.sampling import SamplingConfig

        while True:
            first = self.q.get()
            batch = [first]
            deadline = time.perf_counter() + self.window_ms / 1000.0
            while len(batch) < self.max_batch and time.perf_counter() < deadline:
                try:
                    batch.append(self.q.get(timeout=max(deadline - time.perf_counter(), 0.001)))
                except queue.Empty:
                    break
            prompts = [b[0] for b in batch]
            max_new = max(b[1] for b in batch)
            cfg0 = batch[0][4] or SamplingConfig()
            t0 = time.perf_counter()
            cache = self.model.init_cache(len(batch), self.max_len, jnp.bfloat16)
            toks, n_valid, _ = ragged_batched_generate(
                self.model, prompts, cache,
                SamplingConfig(max_new_tokens=max_new, do_sample=cfg0.do_sample,
                               temperature=cfg0.temperature, top_k=cfg0.top_k,
                               top_p=cfg0.top_p)
            )
            dt = time.perf_counter() - t0
            self.metrics.set("mllm_last_batch_size", len(batch))
            for i, (pids, mt, done, t_in, _cfg) in enumerate(batch):
                out = toks[i, : min(int(n_valid[i]), mt)].tolist()
                self.genmetrics.record(len(pids), len(out), dt, time.perf_counter() - t_in)
                done.put(out)


def make_handler(engine: Engine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path == "/metrics":
                body = engine.metrics.to_prometheus().encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/healthz":
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"ok")
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            if self.path not in ("/v1/completions", "/v1/chat/completions"):
                self.send_response(404)
                self.end_headers()
                return
            n = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(n) or b"{}")
            except (json.JSONDecodeError, ValueError):
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(b'{"error": "invalid JSON body"}')
                return
            image_b64 = req.get("image_b64")
            video_b64 = req.get("video_b64")  # list of base64 frames
            if self.path.endswith("chat/completions"):
                from mllm_tpu.tokenizers.chat_templates import render

                # OpenAI-style multimodal content: flatten text parts and
                # collect data-URI image parts into image_b64
                messages = []
                for m in req.get("messages", []):
                    content = m.get("content", "")
                    if isinstance(content, list):
                        texts = []
                        for part in content:
                            if part.get("type") == "text":
                                texts.append(part.get("text", ""))
                            elif part.get("type") == "image_url":
                                url = part.get("image_url", {}).get("url", "")
                                if url.startswith("data:") and "," in url:
                                    image_b64 = url.split(",", 1)[1]
                        content = "\n".join(texts)
                    messages.append({**m, "content": content})
                if image_b64 or video_b64:
                    # the VL processor applies its own chat template with the
                    # vision tokens — pass it the raw user text, not a
                    # second rendering
                    text = "\n".join(m["content"] for m in messages
                                      if m.get("role") == "user")
                else:
                    text = render(engine.cfg.model_type, messages)
            else:
                text = req.get("prompt", "")
            from mllm_tpu.generation.sampling import SamplingConfig

            temp = float(req.get("temperature", 0.0))
            sampling = SamplingConfig(
                do_sample=temp > 0, temperature=temp or 0.7,
                top_k=int(req.get("top_k", 0)),
                top_p=float(req.get("top_p", 0.0)))
            stop = req.get("stop") or []
            if isinstance(stop, str):
                stop = [stop]
            if (image_b64 or video_b64) and getattr(engine, "vl_proc", None) is not None:
                import base64
                import io

                from PIL import Image

                def dec(b):
                    return Image.open(io.BytesIO(base64.b64decode(b)))

                if video_b64:
                    done, n_prompt = engine.submit_image(
                        text, None, int(req.get("max_tokens", 64)),
                        video=[dec(f) for f in video_b64], sampling=sampling)
                else:
                    done, n_prompt = engine.submit_image(
                        text, dec(image_b64), int(req.get("max_tokens", 64)),
                        sampling=sampling)
                ids = np.zeros(n_prompt, np.int32)  # for the usage report
            else:
                ids = np.asarray(engine.tok.encode(text, bos=True), np.int32)
                if req.get("stream") and hasattr(engine, "submit_stream"):
                    self._stream_response(engine, ids, req, sampling, stop)
                    return
                done = engine.submit(ids, int(req.get("max_tokens", 64)),
                                     sampling=sampling)
            out_ids = done.get()
            text_out = engine.tok.decode(out_ids)
            finish = "stop"
            for ss in stop:  # OpenAI `stop`: truncate at the first occurrence
                i = text_out.find(ss)
                if i >= 0:
                    text_out = text_out[:i]
            if len(out_ids) >= int(req.get("max_tokens", 64)):
                finish = "length"
            resp = {
                "object": "text_completion",
                "choices": [{"text": text_out, "index": 0, "finish_reason": finish}],
                "usage": {"prompt_tokens": len(ids), "completion_tokens": len(out_ids)},
            }
            body = json.dumps(resp).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def _stream_response(self, engine, ids, req, sampling, stop):
            """OpenAI-style SSE: one `data: {...}` chunk per token delta,
            then `data: [DONE]`.  Tokens arrive from the engine's per-window
            queue; text deltas re-decode the accumulated ids so multi-byte
            characters assemble correctly across token boundaries."""
            q = engine.submit_stream(ids, int(req.get("max_tokens", 64)),
                                     sampling=sampling)
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            toks, sent = [], ""
            while True:
                t = q.get(timeout=600)
                if t is None:
                    break
                toks.append(t)
                full = engine.tok.decode(toks)
                if full.endswith("\ufffd"):  # mid-codepoint: wait for more
                    continue
                delta, cut = full[len(sent):], None
                probe = sent + delta
                for ss in stop:
                    i = probe.find(ss)
                    if i >= 0:
                        cut = i
                if cut is not None:
                    delta = probe[:cut][len(sent):]
                if delta:
                    chunk = {"object": "text_completion.chunk",
                             "choices": [{"text": delta, "index": 0}]}
                    self.wfile.write(f"data: {json.dumps(chunk)}\n\n".encode())
                    self.wfile.flush()
                    sent += delta
                if cut is not None:
                    break
            self.wfile.write(b"data: [DONE]\n\n")
            self.wfile.flush()

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--port", type=int, default=8000)
    ap.add_argument("-l", "--limits", type=int, default=2048)
    ap.add_argument("-q", "--quant", choices=["int8", "int8-a8", "int4", "int4-mixed"], default=None)
    ap.add_argument("--batch-window-ms", type=int, default=30)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--engine", choices=["continuous", "window", "sd"],
                    default="continuous",
                    help="continuous = slot batching (throughput); window = "
                         "lockstep micro-batching; sd = single-stream "
                         "speculative decoding (latency)")
    ap.add_argument("--kv", choices=["bf16", "int8", "int4"], default="bf16",
                    help="serving KV cache dtype (int8 = 2x context per chip, "
                         "int4 = 4x; fused quant decode kernels)")
    ap.add_argument("--paged", type=int, default=0, metavar="BLOCKS",
                    help="paged KV cache: reserve 128-token blocks per request "
                         "from a BLOCKS-sized pool instead of max_len per slot "
                         "(vLLM-style; short requests stop paying for long "
                         "contexts). 0 = dense per-slot cache")
    ap.add_argument("--image-size", type=int, default=448, metavar="PX",
                    help="resize served images to PX x PX (multiple of 28; one "
                         "compiled vision program for all requests; 0 = "
                         "aspect-preserving smart_resize, compiles per shape)")
    ap.add_argument("--prefix-cache", type=int, default=0, metavar="N",
                    help="automatic prefix caching: keep the KV of the last N "
                         "admitted prompts; requests sharing a bucket-aligned "
                         "prefix (e.g. a system prompt) skip its re-prefill")
    args = ap.parse_args()

    from mllm_tpu.models.registry import auto_model

    import json as _json

    with open(os.path.join(args.model, "config.json")) as f:
        _mt = _json.load(f).get("model_type", "")
    if _mt in ("qwen2_vl", "qwen2_5_vl"):  # flagship multimodal serving
        from mllm_tpu.models.registry import auto_model_any
        from mllm_tpu.tokenizers.hf_json import auto_tokenizer

        model, _ = auto_model_any(args.model, dtype=jnp.bfloat16, quant=args.quant)
        tok = auto_tokenizer(args.model)
        cfg = model.cfg.text
    else:
        model, tok, cfg = auto_model(args.model, dtype=jnp.bfloat16, quant=args.quant)
    if args.engine == "sd":
        engine = SpeculativeFrontend(model, tok, cfg, args.limits)
    elif args.engine == "continuous":
        engine = ContinuousFrontend(model, tok, cfg, args.limits, args.max_batch,
                                    kv_dtype=args.kv, prefix_cache=args.prefix_cache,
                                    image_size=args.image_size or None,
                                    paged=args.paged)
    else:
        engine = Engine(model, tok, cfg, args.limits, args.batch_window_ms, args.max_batch)
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(engine))
    from mllm_tpu.utils.log import log_info

    log_info("serving", model=args.model, port=args.port, quant=args.quant or "bf16")
    server.serve_forever()


if __name__ == "__main__":
    main()
