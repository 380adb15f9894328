"""Minimal production serving layer: HTTP video-stylization service.

    python -m rerevst_tpu.serve --checkpoint model.msgpack --port 8787

Endpoints (image payloads are encoded images — png/jpg — as request bodies):

  GET  /healthz            -> {"ok": true, "device": ...}
  POST /style              set the style image; resets sequence state
  POST /pass1?last=0|1     feed a sampled frame to Pass 1 (global stats);
                           last=1 finalizes (compute())
  POST /stylize            stylize one frame -> image bytes (Pass 2)
  POST /video?interval=N   whole clip in one request: multipart-free simple
                           concatenation protocol (N frames as a .npz body),
                           returns stylized frames as an .npz

The service wraps one Stylization session (one XLA program per geometry);
single-threaded by design — scale by running one process per chip and
sharding clips across them (the embarrassingly-parallel Pass 2 makes any
frame-level load balancing correct).
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Optional

import numpy as np


def _imdecode(buf: bytes) -> np.ndarray:
    import cv2

    img = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("undecodable image payload")
    return img


def _imencode(img_bgr: np.ndarray, ext: str = ".png") -> bytes:
    import cv2

    ok, buf = cv2.imencode(ext, img_bgr)
    if not ok:
        raise ValueError("encode failed")
    return buf.tobytes()


class StylizeService:
    """Thread-safe wrapper around one Stylization session."""

    def __init__(self, checkpoint: str, dtype: str = "bf16",
                 use_global: bool = True):
        import jax.numpy as jnp

        from rerevst_tpu.api import Stylization
        from rerevst_tpu.config import ModelConfig

        cfg = ModelConfig(
            dtype=jnp.bfloat16 if dtype == "bf16" else jnp.float32)
        self.session = Stylization(checkpoint=checkpoint, cfg=cfg,
                                   use_global=use_global)
        self.lock = threading.Lock()

    def healthz(self):
        import jax

        return {"ok": True, "device": str(jax.devices()[0]),
                "has_style": self.session.style is not None,
                "has_stats": self.session.stats is not None}

    def set_style(self, img):
        with self.lock:
            self.session.prepare_style(img)
            self.session.clean()

    def pass1(self, img, last: bool):
        with self.lock:
            self.session.add(img)
            if last:
                self.session.compute()

    def stylize(self, img):
        with self.lock:
            return self.session.transfer(img)

    def video(self, frames, interval: int):
        from rerevst_tpu.config import InferenceConfig

        with self.lock:
            self.session.infer = InferenceConfig(
                sample_interval=interval,
                use_global=self.session.use_global,
                batch_size=min(len(frames), 8))
            self.session.clean()
            return list(self.session.stylize_video(frames))


def make_handler(svc: StylizeService):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code, body, ctype="application/json"):
            data = (json.dumps(body).encode() if ctype == "application/json"
                    else body)
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _body(self) -> bytes:
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n)

        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path.startswith("/healthz"):
                return self._reply(200, svc.healthz())
            return self._reply(404, {"error": "not found"})

        def do_POST(self):
            try:
                path, _, query = self.path.partition("?")
                qs = dict(kv.split("=", 1) for kv in query.split("&") if "=" in kv)
                if path == "/style":
                    svc.set_style(_imdecode(self._body()))
                    return self._reply(200, {"ok": True})
                if path == "/pass1":
                    svc.pass1(_imdecode(self._body()),
                              last=qs.get("last", "0") == "1")
                    return self._reply(200, {"ok": True})
                if path == "/stylize":
                    out = svc.stylize(_imdecode(self._body()))
                    return self._reply(200, _imencode(out), "image/png")
                if path == "/video":
                    with np.load(io.BytesIO(self._body())) as z:
                        frames = [z[k] for k in sorted(z.files)]
                    outs = svc.video(frames, int(qs.get("interval", "8")))
                    bio = io.BytesIO()
                    np.savez_compressed(
                        bio, **{f"f{i:05d}": o for i, o in enumerate(outs)})
                    return self._reply(200, bio.getvalue(),
                                       "application/octet-stream")
                return self._reply(404, {"error": "not found"})
            except Exception as e:  # noqa: BLE001 — service boundary
                return self._reply(400, {"error": str(e)})

    return Handler


def serve(checkpoint: str, port: int = 8787, host: str = "127.0.0.1",
          dtype: str = "bf16", use_global: bool = True) -> HTTPServer:
    svc = StylizeService(checkpoint, dtype, use_global)
    server = HTTPServer((host, port), make_handler(svc))
    return server


def main(argv=None):
    ap = argparse.ArgumentParser("rerevst_tpu.serve")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--no-global", action="store_true")
    args = ap.parse_args(argv)
    server = serve(args.checkpoint, args.port, args.host, args.dtype,
                   not args.no_global)
    print(f"serving on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
