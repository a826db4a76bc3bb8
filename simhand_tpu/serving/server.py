"""Micro-batching inference server over a serving artifact.

Stdlib-only HTTP front end for one chip: requests are queued and coalesced
into device batches (up to ``--batch``, waiting at most ``--max_wait_ms``
for stragglers), run through the artifact on a single executor thread
(one device stream — concurrent programs would serialize anyway), and
fanned back out. Micro-batching is what makes TPU serving throughput:
a lone 128x128 crop cannot fill the MXU, 128 of them can. The default
``--batch 128`` is the measured device peak on v5e for BOTH bf16 and
W8A8 int8 (SCALING.md batch sweep: bf16 52.6-56.0k img/s, int8
59.9-60.9k; at B=64 the int8 advantage vanishes, above 128 the
HBM-resident activation footprint erodes throughput).

  simhand-serve --artifact enc.shlo --port 8080 --batch 128
  curl -X POST --data-binary @crop.rgb \\
      'http://host:8080/infer?h=128&w=128'    # raw uint8 RGB bytes

Responses are JSON: every output head of the artifact, nested lists.
The artifact must be batch-polymorphic (batch="poly", the default) or
exported at exactly ``--batch``; inputs are resized on device by the
same jitted preprocess as simhand-embed.

This is a deployment convenience, not a load balancer: run one process
per chip behind whatever fleet routing you already have.
"""
from __future__ import annotations

import argparse
import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


def _nearest_resize(img: np.ndarray, side: int) -> np.ndarray:
    """Host-side nearest resample to the artifact's input side (ragged
    request sizes must land in one fixed batch tile; no cv2 dependency)."""
    if img.shape[:2] == (side, side):
        return img
    ys = (np.arange(side) * (img.shape[0] / side)).astype(np.int64)
    xs = (np.arange(side) * (img.shape[1] / side)).astype(np.int64)
    return img[ys][:, xs]


class _Request:
    __slots__ = ("image", "event", "result", "error")

    def __init__(self, image: np.ndarray):
        self.image = image
        self.event = threading.Event()
        self.result = None
        self.error: str | None = None


class MicroBatcher:
    """Coalesces queued requests into fixed-size padded device batches."""

    def __init__(self, call, side: int, batch: int, max_wait_ms: float):
        self.call = call
        self.side = side
        self.batch = batch
        self.max_wait = max_wait_ms / 1e3
        self.queue: queue.Queue[_Request] = queue.Queue()
        self._stop = threading.Event()
        self._preprocess = None
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def submit(self, image: np.ndarray, timeout: float = 30.0):
        req = _Request(image)
        self.queue.put(req)
        if not req.event.wait(timeout):
            raise TimeoutError("inference timed out")
        if req.error:
            raise RuntimeError(req.error)
        return req.result

    def close(self):
        self._stop.set()
        self.thread.join(timeout=5)

    # -- executor thread -------------------------------------------------
    def _collect(self) -> list[_Request]:
        try:
            first = self.queue.get(timeout=0.1)
        except queue.Empty:
            return []
        chunk = [first]
        deadline = self.max_wait
        import time

        t0 = time.perf_counter()
        while len(chunk) < self.batch:
            remaining = deadline - (time.perf_counter() - t0)
            if remaining <= 0:
                break
            try:
                chunk.append(self.queue.get(timeout=remaining))
            except queue.Empty:
                break
        return chunk

    def _loop(self):
        import jax.numpy as jnp

        from simhand_tpu.serving.embed import _preprocess_fn

        preprocess = _preprocess_fn(self.side)
        while not self._stop.is_set():
            chunk = self._collect()
            if not chunk:
                continue
            try:
                k = len(chunk)
                crops = np.zeros(
                    (self.batch, self.side, self.side, 3), np.uint8)
                for i, r in enumerate(chunk):
                    crops[i] = _nearest_resize(r.image, self.side)
                out = self.call(preprocess(jnp.asarray(crops)))
                host = {name: np.asarray(v)[:k] for name, v in out.items()}
                for i, r in enumerate(chunk):
                    r.result = {name: v[i] for name, v in host.items()}
                    r.event.set()
            except Exception as e:  # surface, don't kill the executor
                for r in chunk:
                    r.error = f"{type(e).__name__}: {e}"
                    r.event.set()


def make_handler(batcher: MicroBatcher):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/infer":
                self.send_error(404)
                return
            q = parse_qs(url.query)
            try:
                h = int(q["h"][0])
                w = int(q["w"][0])
                n = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(n)
                img = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
                out = batcher.submit(img)
                body = json.dumps(
                    {k: v.tolist() for k, v in out.items()}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:
                self.send_error(400, f"{type(e).__name__}: {e}")

        def do_GET(self):
            if urlparse(self.path).path != "/healthz":
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Length", "3")
            self.end_headers()
            self.wfile.write(b"ok\n")

    return Handler


def serve(artifact: str, port: int, batch: int, max_wait_ms: float,
          ready: threading.Event | None = None):
    from simhand_tpu.serving import load_artifact

    call, meta = load_artifact(artifact)
    batcher = MicroBatcher(call, int(meta.get("side", 128)), batch,
                           max_wait_ms)
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(batcher))
    if ready is not None:
        ready.httpd = httpd  # type: ignore[attr-defined]
        ready.set()
    try:
        httpd.serve_forever()
    finally:
        batcher.close()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--artifact", required=True)
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    args = p.parse_args(argv)
    print(json.dumps({"serving": args.artifact, "port": args.port,
                      "batch": args.batch}))
    serve(args.artifact, args.port, args.batch, args.max_wait_ms)


if __name__ == "__main__":
    main()
