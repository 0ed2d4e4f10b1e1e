"""Lightweight segmentation inference server (stdlib-only HTTP).

The reference has no serving story (research scripts only, SURVEY.md
§1); production deployment needs one.  This module serves a trained
checkpoint over HTTP with zero dependencies beyond the standard
library:

  GET  /healthz            -> {"status": "ok", "warm": true, ...}
  GET  /info               -> model/config summary
  POST /predict            -> raw label map as PNG (mode L)
       ?color=1            -> VOC-palette colorized PNG instead
       ?sliding=1          -> native-resolution sliding-window inference
       body: image file bytes (any PIL-readable format)

Request geometry: non-square images are LETTERBOXED onto the model's
fixed square input (aspect ratio preserved, ImageNet-mean padding that
normalizes to zero) and predictions crop+resize back to native
resolution — predictions keep the evaluate path's undistorted-geometry
semantics instead of squashing the aspect ratio.  (`?sliding=1` skips
the resize entirely and tiles at native resolution.)

TPU shape: the Predictor's jit forward compiles ONCE at a fixed crop
size during warmup; requests share it (fixed shapes, no per-request
compilation).  With --serve-batch N > 1, concurrent requests are
MICRO-BATCHED onto one fixed-shape batched forward (a lone request
never waits — the worker drains whatever is queued, padding to the jit
batch); batch-N costs barely more than batch-1 on the MXU, so the
DEVICE cost per request drops up to ~N×.  Measured under load (64
concurrent requests, R101 @513², v5e): groups of 8 form as designed
and uint8-to-device + on-device normalization raised loaded
throughput 6.5 -> 8.3 req/s on a 1-CORE host, where the per-request
PNG decode/encode is the remaining bottleneck; with normal host
parallelism the forward is the bottleneck batching removes.
Otherwise the device is serialized behind a lock (the micro-batch
worker shares the same lock, so ?sliding=1 requests and batched
forwards never interleave device work).  Note: the sliding-window
program compiles lazily on the FIRST ?sliding=1 request (warmup only
compiles the fixed-crop forward) — deliberate, since eagerly compiling
a possibly-unused program would add minutes of startup through a
remote-compile relay.  Scale-out is N processes behind any load
balancer, one chip each.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np
from PIL import Image

from zs3_tpu.core.config import Config
from zs3_tpu.train.predict import Predictor
from zs3_tpu.utils.viz import decode_segmap


class ArtifactPredictor:
    """Predictor-compatible facade over an exported StableHLO artifact
    (zs3_tpu.export) — no model code, config, or checkpoint needed.

    The artifact has a FIXED (batch, size) uint8 input with
    normalization baked in; requests resize to it and results resize
    back.  Sliding-window mode needs live logits at arbitrary windows
    and is not supported from a labels artifact.
    """

    def __init__(self, artifact_path: str):
        from zs3_tpu.export import load_exported

        with open(artifact_path + ".json") as f:
            self.manifest = json.load(f)
        if self.manifest.get("emit", "labels") != "labels":
            raise ValueError(
                "serving needs a labels artifact; this one emits "
                f"{self.manifest.get('emit')!r}"
            )
        self.batch = int(self.manifest["batch_size"])
        self.size = int(self.manifest["crop_size"])
        self.num_classes = int(self.manifest["num_classes"])
        self._call = load_exported(artifact_path)

    def predict_array(self, image: np.ndarray) -> np.ndarray:
        """Same letterbox geometry as Predictor.predict_array: aspect
        ratio preserved, ImageNet-mean padding (the artifact bakes in
        normalization, so mean pixels normalize to zero inside it)."""
        from zs3_tpu.data.transforms import letterbox_image, unletterbox_pred

        h, w = image.shape[:2]
        canvas, content = letterbox_image(image, self.size)
        batch = np.broadcast_to(canvas, (self.batch, self.size, self.size, 3))
        pred = np.asarray(self._call(batch))[0]
        return unletterbox_pred(pred, content, (h, w))

    def predict_sliding(self, image: np.ndarray) -> np.ndarray:
        raise ValueError(
            "sliding-window inference is not available when serving an "
            "exported artifact (fixed-shape labels graph); serve a "
            "checkpoint instead"
        )


class _MicroBatcher:
    """Aggregate concurrent requests into fixed-shape batched forwards.

    The jit forward at batch B costs barely more than batch 1 on the
    MXU, so under concurrent load batching cuts device cost per request
    up to ~B×.  A single worker thread drains the queue: it blocks for
    the FIRST request, then greedily takes whatever is ALREADY queued
    up to `max_batch` — no artificial wait window, so a lone request
    never pays latency for peers that may not come.  Groups pad to the
    fixed `max_batch` jit shape (one compilation serves every size).
    """

    def __init__(self, predictor, max_batch: int, device_lock=None):
        import collections
        import queue

        self.predictor = predictor
        self.max_batch = max_batch
        self.queue: "queue.Queue" = queue.Queue()
        # observability (exposed in /info); bounded so a long-running
        # server doesn't grow one int per batch group forever
        self.batch_sizes = collections.deque(maxlen=100)
        # shared with the service's ?sliding=1 path so ALL device work
        # stays serialized behind one lock
        self._device_lock = device_lock or threading.Lock()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def predict(self, image: np.ndarray) -> np.ndarray:
        done = threading.Event()
        slot: dict = {}
        self.queue.put((image, done, slot))
        done.wait()
        if "error" in slot:
            raise slot["error"]
        return slot["result"]

    def _worker(self):
        import queue

        while True:
            first = self.queue.get()
            group = [first]
            while len(group) < self.max_batch:
                try:
                    group.append(self.queue.get_nowait())
                except queue.Empty:
                    break
            images = [g[0] for g in group]
            try:
                # pad to the fixed jit batch so one compilation serves
                # every group size
                padded = images + [images[0]] * (self.max_batch - len(images))
                with self._device_lock:
                    preds = self.predictor.predict_batch(padded)[: len(images)]
                self.batch_sizes.append(len(images))
                for (_, done, slot), pred in zip(group, preds):
                    slot["result"] = pred
                    done.set()
            except Exception as e:  # propagate to every waiter
                for _, done, slot in group:
                    slot["error"] = e
                    done.set()


class SegmentationService:
    """Predictor wrapper with warmup + single-device serialization
    (micro-batched when serve_batch > 1)."""

    def __init__(
        self,
        cfg: Config,
        checkpoint: Optional[str] = None,
        artifact: Optional[str] = None,
        serve_batch: int = 1,
        int8_calib_images: Optional[list] = None,
    ):
        self.cfg = cfg
        self.batcher: Optional[_MicroBatcher] = None
        self.int8_convs = 0
        self._lock = threading.Lock()
        # Validate argument combinations BEFORE the expensive loads.
        if artifact and serve_batch > 1:
            raise ValueError(
                "--serve-batch needs a live checkpoint predictor; an "
                "exported artifact has a fixed baked-in batch size"
            )
        if artifact and int8_calib_images:
            raise ValueError(
                "int8 calibration applies to a live checkpoint predictor; "
                "an exported artifact's numerics are baked in (pass --int8 "
                "to `export` instead)"
            )
        if artifact:
            self.predictor = ArtifactPredictor(artifact)
            # the artifact is self-describing; surface its true shape
            import dataclasses

            self.cfg = cfg.replace(
                model=dataclasses.replace(
                    cfg.model,
                    num_classes=self.predictor.num_classes,
                    backbone=self.predictor.manifest.get(
                        "backbone", cfg.model.backbone
                    ),
                ),
                data=dataclasses.replace(
                    cfg.data, crop_size=self.predictor.size
                ),
            )
        else:
            self.predictor = Predictor(cfg, checkpoint)
            if int8_calib_images:
                # int8 MXU serving (~1.4x measured images/sec on v5e);
                # calibrates once at startup from the provided files.
                from PIL import Image as PILImage

                calib = [
                    np.asarray(PILImage.open(p).convert("RGB"))
                    for p in int8_calib_images
                ]
                self.int8_convs = self.predictor.quantize(
                    calib, percentile=cfg.train.int8_percentile
                )
            if serve_batch > 1:
                self.batcher = _MicroBatcher(
                    self.predictor, serve_batch, device_lock=self._lock
                )
        self.serve_batch = serve_batch
        self.source = "artifact" if artifact else "checkpoint"
        self.warm = False

    def warmup(self):
        size = self.cfg.data.crop_size
        dummy = np.zeros((size, size, 3), np.uint8)
        if self.batcher is not None:
            # compiles the fixed max_batch program the batcher serves
            self.batcher.predict(dummy)
        else:
            with self._lock:
                self.predictor.predict_array(dummy)
        self.warm = True

    def predict_png(
        self, image_bytes: bytes, color: bool = False, sliding: bool = False
    ) -> bytes:
        image = np.asarray(
            Image.open(io.BytesIO(image_bytes)).convert("RGB")
        )
        if self.batcher is not None and not sliding:
            # micro-batched path: the worker thread owns the device, no
            # lock needed; concurrent requests ride one jit forward
            pred = self.batcher.predict(image)
        else:
            with self._lock:
                if sliding:
                    pred = self.predictor.predict_sliding(image)
                else:
                    pred = self.predictor.predict_array(image)
        if color:
            out = Image.fromarray(
                decode_segmap(pred, self.cfg.model.num_classes)
            )
        else:
            out = Image.fromarray(pred.astype(np.uint8), mode="L")
        buf = io.BytesIO()
        out.save(buf, format="PNG")
        return buf.getvalue()

    def info(self) -> dict:
        return {
            "backbone": self.cfg.model.backbone,
            "num_classes": self.cfg.model.num_classes,
            "crop_size": self.cfg.data.crop_size,
            "output_stride": self.cfg.model.output_stride,
            "warm": self.warm,
            "source": self.source,
            "geometry": "letterbox",
            "int8_convs": self.int8_convs,
            "serve_batch": self.serve_batch,
            "recent_batch_sizes": (
                list(self.batcher.batch_sizes)[-20:] if self.batcher else []
            ),
        }


def _make_handler(service: SegmentationService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet by default
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/healthz":
                self._json(200, {"status": "ok", "warm": service.warm})
            elif path == "/info":
                self._json(200, service.info())
            else:
                self._json(404, {"error": f"unknown path {path}"})

        def do_POST(self):
            path, _, query = self.path.partition("?")
            if path != "/predict":
                self._json(404, {"error": f"unknown path {path}"})
                return
            opts = dict(
                kv.split("=", 1) for kv in query.split("&") if "=" in kv
            )
            try:
                length = int(self.headers.get("Content-Length", 0))
            except ValueError:
                self._json(400, {"error": "malformed Content-Length header"})
                return
            if length <= 0:
                self._json(400, {"error": "empty body; POST image bytes"})
                return
            data = self.rfile.read(length)
            try:
                png = service.predict_png(
                    data,
                    color=opts.get("color") == "1",
                    sliding=opts.get("sliding") == "1",
                )
            except (ValueError, OSError) as e:
                # Undecodable/invalid image -> client error (PIL raises
                # OSError subclasses for bad image bytes).
                self._json(400, {"error": str(e)[:200]})
                return
            except Exception as e:
                # Device/XLA/internal failure -> 5xx so load balancers
                # and monitoring see an unhealthy backend, not a bad
                # request.
                self._json(500, {"error": str(e)[:200]})
                return
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(png)))
            self.end_headers()
            self.wfile.write(png)

    return Handler


class InferenceServer:
    """ThreadingHTTPServer wrapper with background start/stop (tests,
    embedding) and a blocking serve_forever (CLI)."""

    def __init__(
        self,
        cfg: Config,
        checkpoint: Optional[str] = None,
        host: str = "127.0.0.1",
        port: int = 8500,
        artifact: Optional[str] = None,
        serve_batch: int = 1,
        int8_calib_images: Optional[list] = None,
    ):
        self.service = SegmentationService(
            cfg, checkpoint, artifact=artifact, serve_batch=serve_batch,
            int8_calib_images=int8_calib_images,
        )
        self.httpd = ThreadingHTTPServer(
            (host, port), _make_handler(self.service)
        )
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def start(self, warmup: bool = True):
        if warmup:
            self.service.warmup()
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def serve_forever(self, warmup: bool = True):
        if warmup:
            self.service.warmup()
        self.httpd.serve_forever()

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)
