"""Dynamic-batching detection server: production serving over Detector.

The reference's inference surface is an offline batch script
(`run_inference.py`, SURVEY.md §3.2) — it has no online serving stack. On
TPU, online serving has one hard constraint the reference never faced: the
compiled graph has ONE static batch shape, and XLA retraces on any other.
This module turns concurrent single-image requests into fixed-shape batches:

    det = Detector.from_checkpoint("configs/retinanet_kitti.yaml", batch_size=8)
    with DetectionServer(det, max_delay_ms=5.0) as srv:
        fut = srv.submit(image)          # from any thread
        result = fut.result()            # same schema as Detector.__call__

A single worker thread owns the Detector (so device access is serialized —
the TPU runtime is not re-entrant across host threads) and coalesces queued
requests into batches of up to ``detector.batch_size``. The first request in
a batch waits at most ``max_delay_ms`` for co-riders; under load, batches
fill instantly and the server runs at the device's full-batch throughput.
Short slots are padded with zero images inside Detector.__call__'s fixed
canvas, so the device always sees the one compiled shape.

`serve_http` adds a minimal stdlib HTTP front (POST /detect with an encoded
image body) for out-of-process clients; `cli/serve.py` is the CLI wrapper.
"""

from __future__ import annotations

import dataclasses
import json
import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class ServerStats:
    """Counters updated by the batching worker (read-mostly; plain ints are
    GIL-atomic enough for monitoring)."""

    requests: int = 0
    batches: int = 0
    errors: int = 0

    @property
    def mean_batch_fill(self) -> float:
        """Average images per executed batch (the batching win: 1.0 means
        no coalescing happened, detector.batch_size means perfect fill)."""
        return self.requests / self.batches if self.batches else 0.0

    def as_dict(self) -> Dict[str, float]:
        return {
            "requests": self.requests,
            "batches": self.batches,
            "errors": self.errors,
            "mean_batch_fill": self.mean_batch_fill,
        }


class DetectionServer:
    """Coalesces concurrent detect requests into fixed-shape device batches.

    Parameters
    ----------
    detector: infer.api.Detector — owns the compiled graph and batch size.
    max_delay_ms: how long the FIRST request in a batch waits for co-riders
        before the batch launches short (latency/throughput knob).
    """

    _SENTINEL = object()

    def __init__(self, detector, max_delay_ms: float = 5.0):
        self._det = detector
        self.max_delay_ms = float(max_delay_ms)
        self.stats = ServerStats()
        self._queue: "queue.Queue" = queue.Queue()
        self._closed = False
        # Guards the closed-flag/enqueue pair: without it a submit() that
        # passed the closed check could enqueue BEHIND close()'s sentinel
        # and its Future would never resolve.
        self._submit_lock = threading.Lock()
        self._worker = threading.Thread(
            target=self._run, name="bayesod-serve-worker", daemon=True
        )
        self._worker.start()

    # -- client surface -------------------------------------------------------

    def submit(self, image: np.ndarray) -> Future:
        """Enqueue one HxWx3 uint8 image; resolves to Detector.__call__'s
        per-image dict (boxes/covs/probs/scores/entropy/classes, original
        coordinates). Thread-safe."""
        img = np.asarray(image)
        if img.ndim != 3 or img.shape[-1] != 3:
            raise ValueError(f"expected HxWx3 image, got shape {img.shape}")
        fut: Future = Future()
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("DetectionServer is closed")
            self._queue.put((img, fut))
        return fut

    def detect(self, image: np.ndarray, timeout: Optional[float] = None):
        """Blocking single-image convenience wrapper around submit()."""
        return self.submit(image).result(timeout)

    def detect_many(
        self, images: Sequence[np.ndarray], timeout: Optional[float] = None
    ) -> List[Dict[str, np.ndarray]]:
        futs = [self.submit(im) for im in images]
        return [f.result(timeout) for f in futs]

    def close(self) -> None:
        """Stop the worker after draining already-queued requests."""
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(self._SENTINEL)
        self._worker.join()

    def __enter__(self) -> "DetectionServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- batching worker ------------------------------------------------------

    def _fail(self, futs, exc) -> None:
        self.stats.errors += len(futs)
        for fut in futs:
            if not fut.cancelled():
                fut.set_exception(exc)

    def _resolve(self, futs, results) -> None:
        for fut, res in zip(futs, results):
            if not fut.cancelled():
                fut.set_result(res)
        self.stats.requests += len(futs)
        self.stats.batches += 1

    def _run(self) -> None:
        max_batch = self._det.batch_size
        # Detectors exposing the dispatch/collect split (infer.api.Detector)
        # get a 1-deep pipeline: batch i+1 is preprocessed + launched while
        # batch i's results are still on device, so under load host work
        # overlaps device compute. The deferred collect happens only when
        # more work is already queued — an idle server collects immediately
        # and adds no latency. Plain callables fall back to sync calls.
        pipelined = hasattr(self._det, "dispatch") and hasattr(
            self._det, "collect"
        )
        pending = None  # (futures, dispatch handle)

        def collect_pending() -> None:
            nonlocal pending
            futs, handle = pending
            pending = None
            try:
                results = self._det.collect(handle)
            except Exception as e:
                self._fail(futs, e)
                return
            self._resolve(futs, results)

        while True:
            item = self._queue.get()
            if item is self._SENTINEL:
                if pending is not None:
                    collect_pending()
                return
            batch = [item]
            deadline = time.monotonic() + self.max_delay_ms / 1e3
            while len(batch) < max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is self._SENTINEL:
                    # Re-queue so the outer loop exits after this batch.
                    self._queue.put(self._SENTINEL)
                    break
                batch.append(nxt)
            images = [im for im, _ in batch]
            futs = [fut for _, fut in batch]
            if not pipelined:
                try:
                    results = self._det(images)
                except Exception as e:
                    self._fail(futs, e)
                    continue
                self._resolve(futs, results)
                continue
            try:
                handle = self._det.dispatch(images)
            except Exception as e:
                self._fail(futs, e)
                continue
            if pending is not None:
                collect_pending()
            if self._queue.empty():
                pending = (futs, handle)
                collect_pending()
            else:
                pending = (futs, handle)


# -- HTTP front ---------------------------------------------------------------


def decode_image_bytes(data: bytes) -> np.ndarray:
    """PNG/JPEG bytes -> HxWx3 uint8 RGB (cv2-first, PIL fallback — the
    same codec preference as data/loader.load_image_rgb)."""
    try:
        import cv2

        img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("cv2.imdecode returned None")
        return img[..., ::-1].copy()  # BGR -> RGB
    except ImportError:
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def _result_to_json(res: Dict[str, np.ndarray]) -> Dict:
    return {k: np.asarray(v).tolist() for k, v in res.items()}


def make_http_server(server: DetectionServer, host: str = "127.0.0.1",
                     port: int = 0):
    """ThreadingHTTPServer speaking a minimal JSON protocol:

    - ``POST /detect`` body = PNG/JPEG bytes → ``{"detections": {boxes,
      covs, probs, scores, entropy, classes}}`` in original coordinates.
    - ``GET /healthz`` → ``{"ok": true}``; ``GET /stats`` → batching stats.

    Returns the http.server instance (``serve_forever`` not yet called);
    ``srv.server_address`` carries the bound (host, port) — pass port=0 for
    an ephemeral port. Each connection gets its own thread; all of them
    funnel into the one batching worker, which is the point.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: Dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib handler name)
            if self.path == "/healthz":
                self._reply(200, {"ok": True})
            elif self.path == "/stats":
                self._reply(200, server.stats.as_dict())
            else:
                self._reply(404, {"error": f"no route {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/detect":
                self._reply(404, {"error": f"no route {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                image = decode_image_bytes(self.rfile.read(length))
                result = server.detect(image)
                self._reply(200, {"detections": _result_to_json(result)})
            except Exception as e:
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, *args):  # quiet by default
            pass

    return ThreadingHTTPServer((host, port), Handler)


def serve_http(server: DetectionServer, host: str = "0.0.0.0",
               port: int = 8000) -> None:
    """Blocking HTTP serve loop (Ctrl-C to stop)."""
    httpd = make_http_server(server, host, port)
    try:
        httpd.serve_forever()
    finally:
        httpd.server_close()
