"""Minimal HTTP serving front-end for the ChainEngine (stdlib only).

POST /generate  {"prompts": ["..."], "seed": 0}
  → {"images": [...b64 PNG...], "conditions": [...b64 PNG...],
     "latency_s": float}
GET /healthz
  → {"status": "ok", "max_batch": N, "compile_seconds": float}

One engine instance per process; requests are served sequentially (the
compiled program is the unit of concurrency — batch slots are the way to
scale a single chip, more processes/chips behind a balancer the way to
scale out).
"""

from __future__ import annotations

import base64
import io
import json
import time
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Optional

import numpy as np


def _png_b64(arr: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def make_handler(engine):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {
                    "status": "ok",
                    "max_batch": engine.max_batch,
                    "compile_seconds": engine.compile_seconds,
                })
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                try:
                    req = json.loads(self.rfile.read(length) or b"{}")
                except json.JSONDecodeError as e:
                    self._send(400, {"error": f"invalid JSON body: {e}"})
                    return
                prompts = req.get("prompts")
                if not isinstance(prompts, list) or not prompts or \
                        not all(isinstance(p, str) for p in prompts):
                    self._send(400, {"error": "prompts must be a non-empty "
                                              "list of strings"})
                    return
                if len(prompts) > engine.max_batch:
                    self._send(400, {
                        "error": f"at most {engine.max_batch} prompts "
                                 f"per request"})
                    return
                seed = int(req.get("seed", 0))
                t0 = time.perf_counter()
                out = engine.generate(prompts, seed=seed)
                latency = time.perf_counter() - t0
                self._send(200, {
                    "images": [_png_b64(a) for a in out["images"]],
                    "conditions": [_png_b64(a) for a in out["conditions"]],
                    "latency_s": round(latency, 3),
                })
            except Exception as e:  # surface errors as JSON, keep serving
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet default logging
            pass

    return Handler


def serve(engine, host: str = "127.0.0.1", port: int = 8500,
          max_requests: Optional[int] = None) -> HTTPServer:
    """Blocking serve loop (max_requests for tests)."""
    httpd = HTTPServer((host, port), make_handler(engine))
    if max_requests is None:
        httpd.serve_forever()
    else:
        for _ in range(max_requests):
            httpd.handle_request()
    return httpd


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="FG-DM chain HTTP server")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--cn_ckpt", type=str, default=None)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--max_batch", type=int, default=4)
    p.add_argument("--staged", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="compile the chain as four stage programs — "
                   "~2.3x faster cold start, bit-identical output "
                   "(--no-staged for the single fused program)")
    opt = p.parse_args(argv)

    from fgdm_tpu.checkpoint.loader import load_controlnet, load_fgdm
    from fgdm_tpu.serving import ChainEngine

    ld = load_fgdm(opt.ckpt)
    cldm = load_controlnet(opt.cn_ckpt)
    engine = ChainEngine(ld, cldm, max_batch=opt.max_batch,
                         staged=opt.staged)
    print(f"[server] ready on {opt.host}:{opt.port} "
          f"(compile {engine.compile_seconds:.1f}s)")
    serve(engine, opt.host, opt.port)


if __name__ == "__main__":
    main()
