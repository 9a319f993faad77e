"""OpenAI-compatible HTTP serving front end over serve.Engine — the
llama.cpp `llama-server` analog, stdlib-only (ThreadingHTTPServer + SSE).

    python tools/server.py model.gguf --port 8080 --max-batch 8

Endpoints:
  GET  /health               -> {"status": "ok"}
  GET  /v1/models            -> model listing
  POST /v1/completions       -> text or token-array prompt; stream via SSE
  POST /v1/chat/completions  -> messages with a plain role template

Per-request temperature/top_p ride the engine's slot-vector sampler
(serve.Engine submit(sampling=...)); temperature 0 = greedy.  All engine
interaction happens on ONE worker thread (the engine is not thread-safe);
HTTP handler threads communicate through queue.Queue handoffs, so
continuous batching interleaves concurrent requests into shared ticks.
"""

from __future__ import annotations

import argparse
import json
import queue
import sys
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


import numpy as np


class ServerState:
    """Model + engine + the single engine worker thread."""

    def __init__(self, model_path: str, max_batch: int = 4, max_seq: int = 512,
                 arch: str | None = None, quantized: bool = False,
                 cache_dtype=None, embed_model: str | None = None,
                 paged=None):
        import jax.numpy as jnp

        from ggml_tpu.gguf import GGUFFile
        from ggml_tpu.models.registry import load_model, load_tokenizer
        from ggml_tpu.serve import Engine

        self.embedder = self.embed_tok = None
        self.embed_model_id = None
        if embed_model:  # BERT-family GGUF behind /v1/embeddings
            from ggml_tpu.models.bert import Bert
            from ggml_tpu.tokenizer import WPMTokenizer

            eg = GGUFFile(embed_model)
            self.embedder = Bert.from_gguf(embed_model)
            if "tokenizer.ggml.tokens" in eg.metadata:
                self.embed_tok = WPMTokenizer.from_gguf(eg)
            self.embed_model_id = embed_model.rsplit("/", 1)[-1]
            self._embed_lock = threading.Lock()

        g = GGUFFile(model_path)
        self.model_id = model_path.rsplit("/", 1)[-1]
        self.model = load_model(model_path, arch=arch, max_seq=max_seq,
                                batch=1, keep_quantized=quantized)
        self.tok = load_tokenizer(g)
        eos = g.metadata.get("tokenizer.ggml.eos_token_id", -1)
        eos = int(eos[0] if isinstance(eos, (list, tuple)) else eos)
        self.eos_id = eos
        ct = g.metadata.get("tokenizer.chat_template", "")
        self.chat_template = ct[0] if isinstance(ct, (list, tuple)) else ct
        toks_meta = g.metadata.get("tokenizer.ggml.tokens")

        def _tok_str(key):
            tid = g.metadata.get(key)
            if tid is None or toks_meta is None:
                return ""
            tid = int(tid[0] if isinstance(tid, (list, tuple)) else tid)
            return str(toks_meta[tid]) if 0 <= tid < len(toks_meta) else ""

        self.bos_token = _tok_str("tokenizer.ggml.bos_token_id")
        self.eos_token = _tok_str("tokenizer.ggml.eos_token_id")
        self.engine = Engine(self.model, max_batch=max_batch, max_seq=max_seq,
                             eos_id=eos, paged=paged,
                             cache_dtype=cache_dtype or jnp.bfloat16)
        self.max_seq = max_seq
        self._lock = threading.Lock()  # serializes submit/cancel vs the loop
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        # one tick at a time; submissions interleave between ticks
        eng = self.engine
        while not self._stop.is_set():
            with self._lock:
                busy = bool(eng.queue) or any(s is not None for s in eng.slots)
                if busy:
                    eng._admit(32)
                    eng._tick()
                    for i, s in enumerate(eng.slots):
                        if s is not None and s.done:
                            eng.slots[i] = None
                            if eng.paged is not None:
                                eng.mgr.release(i)
            if not busy:
                time.sleep(0.005)

    def shutdown(self):
        self._stop.set()
        self._thread.join(timeout=5)

    def submit(self, prompt_ids, max_new, sampling, on_token):
        with self._lock:
            return self.engine.submit(prompt_ids, max_new, on_token=on_token,
                                      sampling=sampling)

    def submit_many(self, prompt_ids, n, max_new, sampling, on_token):
        with self._lock:
            return self.engine.submit_many(prompt_ids, n, max_new,
                                           on_token=on_token,
                                           sampling=sampling)

    def cancel(self, rid):
        with self._lock:
            return self.engine.cancel(rid)

    # -- text helpers -----------------------------------------------------------

    def encode(self, prompt):
        if isinstance(prompt, list):  # OpenAI token-array prompts
            return [int(t) for t in prompt]
        if self.tok is None:
            raise ValueError("model GGUF has no tokenizer; pass token-id lists")
        return self.tok.encode(prompt)

    def decode(self, ids):
        if self.tok is None:
            return " ".join(str(i) for i in ids)
        return self.tok.decode(list(ids))

    def chat_prompt(self, messages) -> str:
        """Render tokenizer.chat_template from the GGUF when present
        (jinja2, add_generation_prompt=True — the llama.cpp chat-template
        path); otherwise a plain role: content fallback."""
        if self.chat_template:
            import jinja2

            env = jinja2.Environment(trim_blocks=True, lstrip_blocks=True)
            env.globals["raise_exception"] = lambda msg: (_ for _ in ()).throw(
                ValueError(msg))
            return env.from_string(self.chat_template).render(
                messages=messages, add_generation_prompt=True,
                bos_token=self.bos_token, eos_token=self.eos_token)
        lines = [f"{m.get('role', 'user')}: {m.get('content', '')}"
                 for m in messages]
        return "\n".join(lines) + "\nassistant:"

    def embed(self, inputs) -> list[list[float]]:
        """inputs: str | [str] | [ids] | [[ids]] -> L2-normalized vectors."""
        if self.embedder is None:
            raise ValueError("no embedding model loaded (--embed-model)")
        if isinstance(inputs, str):
            inputs = [inputs]
        if inputs and isinstance(inputs[0], int):
            inputs = [inputs]
        seqs = []
        for item in inputs:
            if isinstance(item, str):
                if self.embed_tok is None:
                    raise ValueError("embed model GGUF has no tokenizer; "
                                     "pass token-id lists")
                seqs.append(self.embed_tok.encode(item))
            else:
                seqs.append([int(t) for t in item])
        t = max(len(s) for s in seqs)
        toks = np.zeros((len(seqs), t), np.int32)
        mask = np.zeros((len(seqs), t), np.float32)
        for r, s in enumerate(seqs):
            toks[r, :len(s)] = s
            mask[r, :len(s)] = 1.0
        with self._embed_lock:
            _, e = self.embedder.encode(toks, mask, normalize=True)
        return [list(map(float, row)) for row in np.asarray(e)]


def _sampling_from(body) -> dict | None:
    temp = float(body.get("temperature", 1.0))
    top_p = float(body.get("top_p", 1.0))
    if temp == 0.0:
        return {"temperature": 0.0}
    return {"temperature": temp, "top_p": top_p}


class _Generation:
    """Bridges the engine's on_token callback to an HTTP handler thread,
    applying stop-sequence scanning on the decoded text."""

    def __init__(self, state: ServerState, prompt_ids, max_new, sampling,
                 stops, _fork=None):
        self.state = state
        self.ids: list[int] = []
        self.stops = stops or []
        if _fork is None:
            self.q: queue.Queue = queue.Queue()
            self.rid = state.submit(prompt_ids, max_new, sampling,
                                    lambda rid, tok, done: self.q.put((tok, done)))
        else:
            self.rid, self.q = _fork

    @staticmethod
    def fork(state: ServerState, prompt_ids, n: int, max_new, sampling, stops):
        """n shared-prefix continuations (Engine.submit_many): the prompt
        prefills once; each choice gets its own event stream."""
        qs: dict = {}

        def cb(rid, tok, done):
            qs.setdefault(rid, queue.Queue()).put((tok, done))

        rids = state.submit_many(prompt_ids, n, max_new, sampling, cb)
        return [_Generation(state, prompt_ids, max_new, sampling, stops,
                            _fork=(rid, qs.setdefault(rid, queue.Queue())))
                for rid in rids]

    def events(self):
        """Yields (delta_text, finish_reason|None); finish_reason arrives
        exactly once, on the final event.  Stop strings use holdback: text
        that could still be the prefix of a stop sequence is withheld until
        disambiguated, so streamed output never needs retraction."""
        emitted = 0
        holdback = max((len(s) - 1 for s in self.stops), default=0)
        eos = self.state.eos_id
        while True:
            tok, done = self.q.get()
            if tok == eos and eos >= 0:
                yield "", "stop"
                return
            self.ids.append(tok)
            text = self.state.decode(self.ids)
            hit_at = min((text.index(s) for s in self.stops if s in text),
                         default=-1)
            if hit_at >= 0:
                self.state.cancel(self.rid)
                yield text[emitted:hit_at] if hit_at > emitted else "", "stop"
                return
            if done:
                yield text[emitted:], "length"
                return
            safe = max(emitted, len(text) - holdback)
            if safe > emitted:
                yield text[emitted:safe], None
                emitted = safe


def make_handler(state: ServerState):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code, obj):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/health":
                return self._json(200, {"status": "ok"})
            if self.path == "/v1/models":
                data = [{"id": state.model_id, "object": "model",
                         "owned_by": "ggml_tpu"}]
                if state.embed_model_id:
                    data.append({"id": state.embed_model_id, "object": "model",
                                 "owned_by": "ggml_tpu"})
                return self._json(200, {"object": "list", "data": data})
            return self._json(404, {"error": "not found"})

        def _read_body(self):
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        def do_POST(self):
            try:
                if self.path == "/v1/completions":
                    return self._completions(chat=False)
                if self.path == "/v1/chat/completions":
                    return self._completions(chat=True)
                if self.path == "/v1/embeddings":
                    body = self._read_body()
                    vecs = state.embed(body.get("input", []))
                    return self._json(200, {
                        "object": "list", "model": state.embed_model_id,
                        "data": [{"object": "embedding", "index": i,
                                  "embedding": v} for i, v in enumerate(vecs)],
                        "usage": {"prompt_tokens": 0, "total_tokens": 0}})
                return self._json(404, {"error": "not found"})
            except ValueError as e:
                return self._json(400, {"error": {"message": str(e)}})

        def _completions(self, chat: bool):
            body = self._read_body()
            if chat:
                prompt_ids = state.encode(state.chat_prompt(body.get("messages", [])))
            else:
                prompt_ids = state.encode(body.get("prompt", ""))
            if len(prompt_ids) >= state.max_seq:
                raise ValueError(f"prompt of {len(prompt_ids)} tokens exceeds "
                                 f"max_seq {state.max_seq}")
            max_new = int(body.get("max_tokens", 16))
            max_new = min(max_new, state.max_seq - len(prompt_ids) - 1)
            stops = body.get("stop") or []
            if isinstance(stops, str):
                stops = [stops]
            n = int(body.get("n", 1))
            if n > 1 and body.get("stream"):
                raise ValueError("stream with n > 1 is not supported")
            if n > 1:
                gens = _Generation.fork(state, prompt_ids, n, max_new,
                                        _sampling_from(body), stops)
            else:
                gens = [_Generation(state, prompt_ids, max_new,
                                    _sampling_from(body), stops)]
            gen = gens[0]
            rid = f"cmpl-{uuid.uuid4().hex[:12]}"
            created = int(time.time())
            kind = "chat.completion" if chat else "text_completion"

            if body.get("stream"):
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def raw_chunk(data: bytes):
                    self.wfile.write(hex(len(data))[2:].encode() + b"\r\n"
                                     + data + b"\r\n")

                for delta, fin in gen.events():
                    if chat:
                        d = {"delta": ({"content": delta} if delta else {}),
                             "index": 0, "finish_reason": fin}
                    else:
                        d = {"text": delta, "index": 0, "finish_reason": fin}
                    raw_chunk(b"data: " + json.dumps(
                        {"id": rid, "object": kind + ".chunk",
                         "created": created, "model": state.model_id,
                         "choices": [d]}).encode() + b"\n\n")
                raw_chunk(b"data: [DONE]\n\n")
                self.wfile.write(b"0\r\n\r\n")
                return

            choices, n_out = [], 0
            for idx, g in enumerate(gens):
                parts, fin = [], "length"
                for delta, f in g.events():
                    parts.append(delta)
                    if f:
                        fin = f
                text = "".join(parts)
                n_out += len(g.ids)
                if chat:
                    choices.append({"index": idx, "finish_reason": fin,
                                    "message": {"role": "assistant",
                                                "content": text}})
                else:
                    choices.append({"index": idx, "finish_reason": fin,
                                    "text": text})
            usage = {"prompt_tokens": len(prompt_ids),
                     "completion_tokens": n_out,
                     "total_tokens": len(prompt_ids) + n_out}
            return self._json(200, {"id": rid, "object": kind,
                                    "created": created,
                                    "model": state.model_id,
                                    "choices": choices, "usage": usage})

    return Handler


def serve(state: ServerState, host: str = "127.0.0.1", port: int = 8080):
    httpd = ThreadingHTTPServer((host, port), make_handler(state))
    return httpd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max-batch", type=int, default=4)
    ap.add_argument("--max-seq", type=int, default=512)
    ap.add_argument("--arch", default=None)
    ap.add_argument("--quantized", action="store_true")
    ap.add_argument("--embed-model", default=None,
                    help="BERT-family GGUF served at /v1/embeddings")
    ap.add_argument("--paged", action="store_true",
                    help="paged KV cache (llama/gptj families)")
    ap.add_argument("--page-size", type=int, default=16)
    ap.add_argument("--n-pages", type=int, default=0,
                    help="page pool size (default: max_batch x max_seq worth)")
    ap.add_argument("--prefix-cache", action="store_true",
                    help="automatic prefix caching (implies --paged)")
    args = ap.parse_args()
    paged = None
    if args.paged or args.prefix_cache:
        from ggml_tpu.paged_kv import PagedConfig

        per_seq = -(-args.max_seq // args.page_size)
        paged = PagedConfig(
            page_size=args.page_size,
            n_pages=args.n_pages or args.max_batch * per_seq + per_seq,
            max_pages_per_seq=per_seq,
            prefix_cache=args.prefix_cache)
    state = ServerState(args.model, max_batch=args.max_batch,
                        max_seq=args.max_seq, arch=args.arch,
                        quantized=args.quantized, embed_model=args.embed_model,
                        paged=paged)
    httpd = serve(state, args.host, args.port)
    print(f"listening on http://{args.host}:{args.port} "
          f"(model {state.model_id}, batch {args.max_batch})")
    try:
        httpd.serve_forever()
    finally:
        state.shutdown()


if __name__ == "__main__":
    main()
