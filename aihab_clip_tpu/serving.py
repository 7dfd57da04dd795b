"""Persistent serving: classifier engine + dynamic batcher + HTTP server.

The reference has no serving story at all — its closest surface is a
batch evaluation loop over labeled datasets (`/root/reference/main.py`,
`/root/reference/methods/PEFT_openclip.py:50-136`).  This module turns
the TPU encode path into a long-lived service:

* :class:`ClassifierEngine` — loads a model once, builds the CS
  prompt-ensemble text head, and compiles ONE fixed-shape jitted
  ``uint8 batch -> softmax probs`` program (the same fast-tower dispatch
  as ``tools/predict``: merged/split Pallas block kernels on TPU, int8
  option, LoRA merge).  Fixed batch shape means exactly one compiled
  executable for the server's lifetime — no recompiles, ever.
* :class:`DynamicBatcher` — request threads submit single decoded
  images; a collector thread coalesces them into padded device batches
  (up to ``batch_size``, waiting at most ``max_wait_ms`` for stragglers)
  and a separate fetch thread blocks on device results, so batch *i+1*
  collects and dispatches while batch *i*'s result is in flight
  (lag-1 pipelining — the same discipline as the predict CLI's loop).
* :class:`PredictServer` — stdlib ``ThreadingHTTPServer`` exposing
  ``POST /predict`` (raw image bytes; JSON ``{"images_b64": [...]}``; or
  the length-prefixed ``application/x-aihab-batch`` binary wire —
  ``encode_binary_batch`` — which skips base64+JSON on the hot path),
  ``GET /healthz`` and ``GET /stats``.

TPU-first design notes: batching exists to keep the MXU fed — a single
439px request costs the same device time as a full batch, so the
batcher's fill ratio IS the serving efficiency; stats expose it.  Decode
happens on request threads (cv2 releases the GIL), device work stays on
one thread, and everything crossing the host->device boundary is one
contiguous padded uint8 array.
"""

from __future__ import annotations

import base64
import binascii
import json
import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from .backend import dispatch_backend


def _parse_binary_batch(body: bytes) -> List[bytes]:
    """``application/x-aihab-batch`` framing -> blob list.

    Layout: u32le N, then N u32le lengths, then the N blobs
    concatenated.  ``encode_binary_batch`` is the client-side inverse.
    """
    import struct

    if len(body) < 4:
        raise ValueError("truncated header")
    (n,) = struct.unpack_from("<I", body, 0)
    if n == 0 or n > 1 << 20:
        raise ValueError(f"implausible image count {n}")
    header_end = 4 + 4 * n
    if len(body) < header_end:
        raise ValueError("truncated length table")
    lengths = struct.unpack_from(f"<{n}I", body, 4)
    total = sum(lengths)
    if len(body) != header_end + total:
        raise ValueError(
            f"body size {len(body)} != header {header_end} + blobs {total}")
    blobs, off = [], header_end
    for ln in lengths:
        blobs.append(body[off:off + ln])
        off += ln
    return blobs


def encode_binary_batch(blobs: Sequence[bytes]) -> bytes:
    """Client-side framing for ``POST /predict`` with
    ``Content-Type: application/x-aihab-batch``."""
    import struct

    head = struct.pack("<I", len(blobs)) + struct.pack(
        f"<{len(blobs)}I", *[len(b) for b in blobs])
    return head + b"".join(blobs)


class ClassifierEngine:
    """Load-once, compile-once image classifier.

    Owns the model bundle, the CS text head, and a single jitted
    ``classify(weights, uint8[B, D, D, 3]) -> probs[B, C]`` program.
    Thread-safe for concurrent :meth:`decode_bytes`; :meth:`classify_batch`
    dispatches from any thread (JAX serializes device work internally)
    but callers should funnel through one thread to keep dispatch order
    deterministic (the :class:`DynamicBatcher` does).
    """

    def __init__(
        self,
        model: str = "ViT-B/16",
        batch_size: int = 64,
        resolution: int = 0,
        flat: bool = False,
        lora: Optional[str] = None,
        lora_alpha: float = 16.0,
        quantize: str = "none",
        verbose: bool = True,
        buckets: int = 3,
    ):
        import jax.numpy as jnp

        from .models import build_text_head, load
        from .taxonomy import CS_CLASSNAMES, REASSIGN_LABEL_NAME_L3
        from .templates import gen_prompts

        self.model_name = model
        self.batch_size = int(batch_size)
        # compiled batch-shape buckets (batch_size, /2, /4, ...): a
        # partially-filled collection window dispatches the smallest
        # bucket that holds it instead of wasting device time on padding
        # (the r2 batcher's fill=0.42 case burned 58% of device compute —
        # BENCHMARKS.md "Persistent serving").  XLA compiles one
        # executable per shape; warmup() pre-compiles all of them.
        self.bucket_sizes = sorted({max(1, self.batch_size >> i)
                                    for i in range(max(1, int(buckets)))})
        self.verbose = verbose
        self.class_names = list(CS_CLASSNAMES)
        self.label_names = dict(REASSIGN_LABEL_NAME_L3)

        # bf16 compute on TPU (the benchmarked fast-tower configuration)
        self._compute_dtype = (jnp.bfloat16 if dispatch_backend() == "tpu"
                               else jnp.float32)
        bundle = load(model, dtype=self._compute_dtype)
        self.bundle = bundle
        params = bundle.params
        if lora:
            params = self._merge_lora(params, lora, lora_alpha)
        self.resolution = resolution or bundle.config.image_resolution
        if self.resolution != bundle.config.image_resolution:
            raise ValueError(
                f"resolution {self.resolution} does not match the model's "
                f"positional embedding (trained at "
                f"{bundle.config.image_resolution}px)")
        # decode at >= 224 so the AA-bicubic eval resize has real work to
        # anti-alias (matches the predict CLI / reference resize_dim=439
        # semantics of decoding larger than the crop)
        self.decode_dim = max(self.resolution, 224)

        prompts, tpc = gen_prompts(use_hierarchy=not flat,
                                   use_descriptive=not flat)
        head = build_text_head(
            bundle.model, bundle.params, prompts, len(self.class_names), tpc,
            context_length=bundle.config.context_length,
            tokenize_fn=getattr(bundle, "tokenize_fn", None))
        self._text_weights = jnp.asarray(head["text_weights"])

        self._weights, self._classify = self._build_classify(params, quantize)
        self.quantize = quantize
        self._warm = False

    # -- construction ------------------------------------------------------

    def _merge_lora(self, params, lora_path: str, alpha: float):
        import jax.numpy as jnp

        from .train.lora import lora_merge

        blob = np.load(lora_path)
        adapters: Dict[str, Dict[str, Any]] = {}
        for name in blob.files:  # "<target path>/a" | "<target path>/b"
            path, leaf = name.rsplit("/", 1)
            adapters.setdefault(path, {})[leaf] = jnp.asarray(blob[name])
        if self.verbose:
            print(f"[serving] merged {len(adapters)} LoRA adapters "
                  f"(alpha={alpha}) from {lora_path}")
        return lora_merge(params, adapters, alpha=alpha)

    def _build_classify(self, params, quantize: str):
        """Select the fastest encode path and jit the full classify."""
        import jax
        import jax.numpy as jnp

        from .models.siglip import SigLIPConfig
        from .ops.preprocess import eval_transform, normalize_stats_for

        bundle = self.bundle
        if quantize == "int8":
            if isinstance(bundle.config, SigLIPConfig):
                from .models.quant_siglip import (
                    quantize_siglip_params,
                    siglip_encode_int8,
                )

                weights = (quantize_siglip_params(params, bundle.config),
                           params)

                def encode(p, x):
                    return siglip_encode_int8(p[0], p[1], x, bundle.config,
                                              project=True)[1]
            elif getattr(bundle.config, "vision_tower", "") == "convnext":
                from .models.fast_convnext import (
                    build_dw_matrices,
                    convnext_encode_fused,
                    quantize_convnext_mlp,
                )

                on_tpu = dispatch_backend() == "tpu"
                weights = (params,
                           quantize_convnext_mlp(params, bundle.config),
                           build_dw_matrices(params, bundle.config)
                           if on_tpu else None)
                # interpret-mode kernels off-TPU (tests; production int8
                # serving is a TPU path)
                interp = not on_tpu

                def encode(p, x):
                    return convnext_encode_fused(
                        p[0], x, bundle.config, project=True, qmlp=p[1],
                        dwmat=p[2], interpret=interp)[1]
            elif bundle.config.is_vit:
                from .models.quant_vit import (
                    quantize_vit_params,
                    vit_encode_int8,
                )

                weights = quantize_vit_params(params, bundle.config)

                def encode(p, x):
                    return vit_encode_int8(p, x, bundle.config,
                                           project=True)[1]
            else:
                raise ValueError(
                    "quantize='int8' requires a ViT/SigLIP/ConvNeXt "
                    "backbone")
        elif quantize == "none":
            from .models.fast_vit import encode_image_fastest, pack_fastest

            # per-family fast pack built once at load time (SigLIP qkv
            # head groups / ConvNeXt banded dw matrices / folded-RN
            # convs); passed through the jit ARGUMENT — closing over it
            # would embed multi-GB constants into the compiled program
            pack = pack_fastest(bundle.model, params, bundle.config,
                                self._compute_dtype)
            weights = (params, pack)

            def encode(w, x):
                return encode_image_fastest(
                    bundle.model, w[0], x, bundle.config,
                    project=True, packed=w[1])[1]
        else:
            raise ValueError(f"unknown quantize mode {quantize!r}")

        nmean, nstd = normalize_stats_for(bundle.config)
        res, tw, dtype = self.resolution, self._text_weights, \
            self._compute_dtype

        @jax.jit
        def classify(p, images_u8):
            x = eval_transform(images_u8, res, dtype=dtype,
                               mean=nmean, std=nstd)
            feats = encode(p, x).astype(jnp.float32)
            feats = feats / jnp.maximum(
                jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
            logits = 100.0 * feats @ tw
            return jax.nn.softmax(logits, axis=-1)

        return weights, classify

    # -- runtime -----------------------------------------------------------

    def warmup(self) -> float:
        """Compile + run every bucket shape; returns seconds taken."""
        import jax.numpy as jnp

        t0 = time.perf_counter()
        for b in reversed(self.bucket_sizes):
            dummy = np.zeros((b, self.decode_dim, self.decode_dim, 3),
                             np.uint8)
            np.asarray(self._classify(self._weights, jnp.asarray(dummy)))
        self._warm = True
        dt = time.perf_counter() - t0
        if self.verbose:
            print(f"[serving] warmup compile+run: {dt:.1f}s "
                  f"(buckets {self.bucket_sizes} @ {self.resolution}px, "
                  f"{self.model_name})")
        return dt

    @property
    def warm(self) -> bool:
        return self._warm

    def decode_bytes(self, data: bytes) -> Optional[np.ndarray]:
        """Decode encoded image bytes -> RGB uint8 [decode_dim, decode_dim, 3].

        Returns None on undecodable input.  Camera-size JPEGs take the
        native memory-source decoder with DCT prescale
        (`native/image_pipeline.cpp::decode_resize_mem`, the bulk
        loader's decode contract); small sources, non-JPEG formats and
        missing-native builds use cv2.  Outputs match the cv2 pair to
        IDCT variance on the full-res path and to the bulk CLI bit-for-
        bit on the prescale path.  Decode+resize contract:
        `/root/reference/data/dataset.py:117-120`.
        ``AIHAB_SERVE_DECODE=cv2|native`` forces one path (A/B).
        """
        import os

        from .native import native_decode_resize_mem

        if os.environ.get("AIHAB_SERVE_DECODE") != "cv2":
            img = native_decode_resize_mem(data, self.decode_dim,
                                           prescale_min=2 * self.decode_dim)
            if img is not None:
                return img
        return self._decode_bytes_cv2(data)

    def _decode_bytes_cv2(self, data: bytes) -> Optional[np.ndarray]:
        import cv2

        buf = np.frombuffer(data, np.uint8)
        img = cv2.imdecode(buf, cv2.IMREAD_COLOR)  # BGR
        if img is None:
            return None
        img = cv2.resize(img, (self.decode_dim, self.decode_dim))
        return np.ascontiguousarray(img[:, :, ::-1])

    def decode_blobs(self, blobs: List[bytes]) -> List[Optional[np.ndarray]]:
        """Decode a request's image list; one OpenMP call when every blob
        is a camera-size JPEG (the common serving payload), per-blob
        size-routed fallback otherwise.  Returns one [D, D, 3] uint8
        array (or None) per input blob."""
        import os

        from .native import native_bulk_decode_resize_mem

        if len(blobs) > 1 and os.environ.get("AIHAB_SERVE_DECODE") != "cv2":
            res = native_bulk_decode_resize_mem(
                blobs, self.decode_dim, prescale_min=2 * self.decode_dim)
            if res is not None:
                out, ok = res
                # failed entries retry through the per-blob path (cv2 can
                # sometimes salvage truncated JPEGs libjpeg rejects)
                return [out[i] if ok[i] else self.decode_bytes(blobs[i])
                        for i in range(len(blobs))]
        return [self.decode_bytes(b) for b in blobs]

    def decode_file(self, path: str) -> Optional[np.ndarray]:
        from .data.bulk_load import _decode_resize

        return _decode_resize(path, self.decode_dim, "rgb")

    def classify_dispatch(self, images_u8: np.ndarray):
        """Dispatch one padded batch; returns the UNFETCHED device array.

        ``images_u8`` must be ``[batch_size, decode_dim, decode_dim, 3]``.
        Call ``np.asarray`` on the result (possibly on another thread) to
        block on completion — this split is what lets a batcher overlap
        collection of batch i+1 with device execution of batch i.
        """
        import jax.numpy as jnp

        if (images_u8.shape[0] not in self.bucket_sizes
                or images_u8.shape[1:] != (self.decode_dim,
                                           self.decode_dim, 3)):
            raise ValueError(
                f"expected (b in {self.bucket_sizes}, {self.decode_dim}, "
                f"{self.decode_dim}, 3), got {images_u8.shape}")
        return self._classify(self._weights, jnp.asarray(images_u8))

    def bucket_for(self, n: int) -> int:
        """Smallest compiled batch shape holding ``n`` rows (largest
        bucket when n exceeds it — callers chunk at batch_size)."""
        for b in self.bucket_sizes:
            if n <= b:
                return b
        return self.bucket_sizes[-1]

    def classify_batch(self, images_u8: np.ndarray,
                       n_valid: Optional[int] = None) -> np.ndarray:
        """Pad to the smallest bucket shape, classify, return valid rows."""
        n = len(images_u8) if n_valid is None else n_valid
        bucket = self.bucket_for(len(images_u8))
        if len(images_u8) < bucket:
            pad = np.zeros((bucket - len(images_u8),
                            self.decode_dim, self.decode_dim, 3), np.uint8)
            images_u8 = np.concatenate([images_u8, pad])
        return np.asarray(self.classify_dispatch(images_u8))[:n]

    def topk(self, probs: np.ndarray, k: int = 3) -> List[List[dict]]:
        """[B, C] probs -> per-image top-k {label, name, prob} records."""
        order = np.argsort(-probs, axis=-1)[:, :k]
        out = []
        for i in range(len(probs)):
            out.append([
                {"label": int(j), "name": self.label_names[int(j)],
                 "prob": float(probs[i, j])} for j in order[i]
            ])
        return out


# ---------------------------------------------------------------------------
# dynamic batcher


@dataclass
class ServerStats:
    """Monotonic counters + a bounded latency window (thread-safe)."""

    requests: int = 0
    images: int = 0
    batches: int = 0
    batch_fill: int = 0          # sum of valid rows over batches
    batch_rows: int = 0          # sum of DISPATCHED rows (bucket sizes)
    decode_failures: int = 0
    started_at: float = field(default_factory=time.time)
    _lat: deque = field(default_factory=lambda: deque(maxlen=2048))
    _lock: threading.Lock = field(default_factory=threading.Lock)

    def record_batch(self, n_valid: int, bucket_rows: int = 0) -> None:
        with self._lock:
            self.batches += 1
            self.batch_fill += n_valid
            self.batch_rows += bucket_rows

    def record_request(self, n_images: int) -> None:
        with self._lock:
            self.requests += 1
            self.images += n_images

    def record_latency(self, seconds: float) -> None:
        with self._lock:
            self._lat.append(seconds)

    def snapshot(self, batch_size: int) -> dict:
        with self._lock:
            lat = sorted(self._lat)
            # fill vs the rows actually dispatched (bucket shapes);
            # falls back to batches*batch_size for legacy callers that
            # never passed bucket_rows
            denom = self.batch_rows or self.batches * batch_size
            fill = self.batch_fill / denom if denom else 0.0
            snap = {
                "requests": self.requests,
                "images": self.images,
                "batches": self.batches,
                "mean_batch_fill": round(fill, 4),
                "decode_failures": self.decode_failures,
                "uptime_s": round(time.time() - self.started_at, 1),
            }
            if lat:
                snap["latency_ms"] = {
                    "p50": round(1e3 * lat[len(lat) // 2], 2),
                    "p99": round(1e3 * lat[int(len(lat) * 0.99)], 2),
                    "max": round(1e3 * lat[-1], 2),
                    "n": len(lat),
                }
        return snap


class DynamicBatcher:
    """Coalesce single-image submissions into padded device batches.

    Two threads: a *collector* drains the submit queue into batches —
    dispatching as soon as ``batch_size`` images are waiting or
    ``max_wait_ms`` has passed since the first — and a *fetcher* blocks
    on each dispatched batch's device result and resolves futures.  With
    both running, the device never waits on collection (lag-1 pipelining)
    and collection never waits on the device.
    """

    def __init__(self, engine: ClassifierEngine, max_wait_ms: float = 5.0,
                 stats: Optional[ServerStats] = None, max_queue: int = 4096):
        self.engine = engine
        self.max_wait = max_wait_ms / 1e3
        self.stats = stats or ServerStats()
        self._submit: queue.Queue = queue.Queue(maxsize=max_queue)
        # maxsize=2 bounds in-flight device batches: collector stalls
        # rather than queueing unbounded device work
        self._inflight: queue.Queue = queue.Queue(maxsize=2)
        self._stop = threading.Event()
        self._threads: List[threading.Thread] = []

    # -- public ------------------------------------------------------------

    def start(self) -> None:
        for name, fn in (("collect", self._collect_loop),
                         ("fetch", self._fetch_loop)):
            t = threading.Thread(target=fn, name=f"batcher-{name}",
                                 daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self, timeout: float = 10.0) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=timeout)

    def submit(self, image_u8: np.ndarray) -> Future:
        """Queue one decoded [D, D, 3] uint8 image; resolves to [C] probs."""
        fut: Future = Future()
        self._submit.put((image_u8, fut))
        return fut

    # -- worker loops ------------------------------------------------------

    def _collect_loop(self) -> None:
        bs = self.engine.batch_size
        while not self._stop.is_set():
            try:
                first = self._submit.get(timeout=0.1)
            except queue.Empty:
                continue
            items = [first]
            deadline = time.monotonic() + self.max_wait
            while len(items) < bs:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    items.append(self._submit.get(timeout=remaining))
                except queue.Empty:
                    break
            # dispatch the smallest compiled bucket that holds the
            # collected items — a 0.42-filled full batch wastes 58% of
            # device time, while a half bucket costs ~half a step
            # (getattr: single-shape engines/stubs without bucket_for)
            bucket_for = getattr(self.engine, "bucket_for", None)
            bucket = bucket_for(len(items)) if bucket_for else bs
            batch = np.zeros((bucket, self.engine.decode_dim,
                              self.engine.decode_dim, 3), np.uint8)
            for i, (img, _) in enumerate(items):
                batch[i] = img
            try:
                dev = self.engine.classify_dispatch(batch)
            except Exception as e:  # resolve rather than hang callers
                for _, fut in items:
                    fut.set_exception(e)
                continue
            self.stats.record_batch(len(items), bucket)
            self._inflight.put((items, dev))

    def _fetch_loop(self) -> None:
        while not (self._stop.is_set() and self._inflight.empty()):
            try:
                items, dev = self._inflight.get(timeout=0.1)
            except queue.Empty:
                continue
            try:
                probs = np.asarray(dev)
            except Exception as e:
                for _, fut in items:
                    fut.set_exception(e)
                continue
            for i, (_, fut) in enumerate(items):
                fut.set_result(probs[i])


# ---------------------------------------------------------------------------
# HTTP server


class _Handler(BaseHTTPRequestHandler):
    """Routes: POST /predict, GET /healthz, GET /stats."""

    server: "PredictServer"  # type narrowing
    protocol_version = "HTTP/1.1"

    # -- helpers -----------------------------------------------------------

    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # quiet by default
        if self.server.verbose:
            super().log_message(fmt, *args)

    # -- routes ------------------------------------------------------------

    def do_GET(self):  # noqa: N802 (stdlib handler naming)
        srv = self.server
        if self.path == "/healthz":
            self._json(200, {
                "status": "ok" if srv.engine.warm else "warming",
                "model": srv.engine.model_name,
                "quantize": srv.engine.quantize,
                "batch_size": srv.engine.batch_size,
                "resolution": srv.engine.resolution,
            })
        elif self.path == "/stats":
            self._json(200, srv.stats.snapshot(srv.engine.batch_size))
        else:
            self._json(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):  # noqa: N802
        if self.path != "/predict":
            self._json(404, {"error": f"unknown path {self.path}"})
            return
        srv = self.server
        t0 = time.perf_counter()
        try:
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length)
            ctype = (self.headers.get("Content-Type") or "").split(";")[0]
            if ctype == "application/json":
                try:
                    payload = json.loads(body)
                    blobs = [base64.b64decode(b, validate=True)
                             for b in payload["images_b64"]]
                except (json.JSONDecodeError, KeyError, TypeError,
                        binascii.Error) as e:
                    self._json(400, {"error": f"bad JSON request: {e}"})
                    return
            elif ctype == "application/x-aihab-batch":
                # length-prefixed binary batch: u32le count, count x u32le
                # blob lengths, then the raw blobs back to back.  The JSON
                # wire costs +33% bytes (base64) plus encode/parse CPU on
                # the 1-vCPU serving host — measured payload-bound at
                # camera sizes (BENCHMARKS.md serving A/B); this framing
                # removes both.
                try:
                    blobs = _parse_binary_batch(body)
                except ValueError as e:
                    self._json(400, {"error": f"bad binary batch: {e}"})
                    return
            else:
                blobs = [body]
            if not blobs:
                self._json(400, {"error": "no images in request"})
                return
            if len(blobs) > srv.max_request_images:
                self._json(413, {"error":
                                 f"too many images ({len(blobs)} > "
                                 f"{srv.max_request_images})"})
                return

            decoded, bad = [], []
            for i, img in enumerate(srv.engine.decode_blobs(blobs)):
                if img is None:
                    bad.append(i)
                else:
                    decoded.append((i, img))
            if bad:
                with srv.stats._lock:
                    srv.stats.decode_failures += len(bad)
            futures = [(i, srv.batcher.submit(img)) for i, img in decoded]
            results: List[Optional[dict]] = [None] * len(blobs)
            for i, fut in futures:
                probs = fut.result(timeout=srv.request_timeout)
                results[i] = {"topk": srv.engine.topk(probs[None],
                                                      srv.topk)[0]}
            for i in bad:
                results[i] = {"error": "undecodable image"}
            srv.stats.record_request(len(decoded))
            srv.stats.record_latency(time.perf_counter() - t0)
            self._json(200, {"predictions": results})
        except Exception as e:  # pragma: no cover - defensive
            self._json(500, {"error": f"{type(e).__name__}: {e}"})


class PredictServer(ThreadingHTTPServer):
    """Long-lived prediction service over a :class:`ClassifierEngine`.

    Use :meth:`serve` for a blocking CLI run or ``serve_background()``
    in tests; the bound port is available as ``server_port`` (pass
    ``port=0`` for an ephemeral one).
    """

    daemon_threads = True

    def __init__(self, engine: ClassifierEngine, host: str = "127.0.0.1",
                 port: int = 8000, max_wait_ms: float = 5.0, topk: int = 3,
                 request_timeout: float = 60.0, max_request_images: int = 256,
                 verbose: bool = True, warmup: bool = True):
        self.engine = engine
        self.stats = ServerStats()
        self.batcher = DynamicBatcher(engine, max_wait_ms=max_wait_ms,
                                      stats=self.stats)
        self.topk = topk
        self.request_timeout = request_timeout
        self.max_request_images = max_request_images
        self.verbose = verbose
        self._warmup = warmup
        super().__init__((host, port), _Handler)

    def serve(self) -> None:
        """Blocking: warmup, start the batcher, serve until interrupted."""
        if self._warmup and not self.engine.warm:
            self.engine.warmup()
        self.batcher.start()
        if self.verbose:
            print(f"[serving] listening on "
                  f"http://{self.server_address[0]}:{self.server_port} "
                  f"(model {self.engine.model_name}, "
                  f"batch {self.engine.batch_size}, "
                  f"quantize {self.engine.quantize})")
        try:
            self.serve_forever()
        finally:
            self.batcher.stop()

    def serve_background(self) -> threading.Thread:
        """Start serving on a daemon thread (tests); returns the thread."""
        if self._warmup and not self.engine.warm:
            self.engine.warmup()
        self.batcher.start()
        t = threading.Thread(target=self.serve_forever, daemon=True,
                             name="predict-server")
        t.start()
        return t

    def stop(self) -> None:
        self.shutdown()
        self.batcher.stop()
        self.server_close()
