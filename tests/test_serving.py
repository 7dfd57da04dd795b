"""Persistent prediction server: engine, dynamic batcher, HTTP API.

The reference has no serving surface (its only inference path is the
labeled-dataset evaluation loop, `/root/reference/methods/
PEFT_openclip.py:50-136`); these tests cover the new subsystem
end-to-end on the CPU backend with a random tiny model.
"""

import base64
import http.client
import json
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from aihab_clip_tpu.serving import (
    ClassifierEngine,
    DynamicBatcher,
    PredictServer,
    ServerStats,
)


def _jpeg_bytes(rng, size=48):
    import cv2

    img = rng.integers(0, 255, (size, size, 3), np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return buf.tobytes()


# ---------------------------------------------------------------------------
# DynamicBatcher unit tests (no model: stub engine)


class _StubEngine:
    batch_size = 4
    decode_dim = 8

    def __init__(self):
        self.batches = []

    def classify_dispatch(self, batch):
        self.batches.append(batch.copy())
        # "probs" = mean pixel per image, so each future's result is
        # attributable to the image that produced it
        return batch.reshape(len(batch), -1).mean(axis=1, keepdims=True)


def test_batcher_coalesces_and_routes_results():
    eng = _StubEngine()
    b = DynamicBatcher(eng, max_wait_ms=50.0)
    b.start()
    try:
        imgs = [np.full((8, 8, 3), v, np.uint8) for v in (10, 20, 30, 40, 50)]
        futs = [b.submit(im) for im in imgs]
        res = [f.result(timeout=5) for f in futs]
        for im, r in zip(imgs, res):
            assert r[0] == pytest.approx(im.mean())
        # 5 submissions, batch_size 4 -> at most 2 device batches
        assert 1 <= len(eng.batches) <= 2
        assert sum((batch.any(axis=(1, 2, 3)) | True).sum()
                   for batch in eng.batches) >= 5
    finally:
        b.stop()


def test_batcher_dispatch_error_resolves_futures():
    class _Boom(_StubEngine):
        def classify_dispatch(self, batch):
            raise RuntimeError("device on fire")

    b = DynamicBatcher(_Boom(), max_wait_ms=1.0)
    b.start()
    try:
        fut = b.submit(np.zeros((8, 8, 3), np.uint8))
        with pytest.raises(RuntimeError, match="device on fire"):
            fut.result(timeout=5)
    finally:
        b.stop()


def test_stats_snapshot():
    s = ServerStats()
    s.record_request(3)
    s.record_batch(3)
    s.record_latency(0.01)
    snap = s.snapshot(batch_size=4)
    assert snap["requests"] == 1 and snap["images"] == 3
    assert snap["mean_batch_fill"] == pytest.approx(0.75)
    assert snap["latency_ms"]["p50"] == pytest.approx(10.0)


def test_stats_snapshot_bucket_rows():
    """Fill accounts against the DISPATCHED bucket rows, not the max
    batch shape (shape-bucket batcher, r4)."""
    s = ServerStats()
    s.record_batch(3, bucket_rows=4)    # 3 valid in a 4-row bucket
    s.record_batch(8, bucket_rows=8)    # full 8-row bucket
    snap = s.snapshot(batch_size=16)
    assert snap["mean_batch_fill"] == pytest.approx(11 / 12, abs=1e-3)


def test_batcher_picks_smallest_bucket():
    """A partial collection window dispatches the smallest bucket shape
    that holds it (not the full batch)."""
    class _BucketStub(_StubEngine):
        batch_size = 8
        bucket_sizes = [2, 4, 8]

        def bucket_for(self, n):
            for b in self.bucket_sizes:
                if n <= b:
                    return b
            return self.bucket_sizes[-1]

    eng = _BucketStub()
    b = DynamicBatcher(eng, max_wait_ms=50.0)
    b.start()
    try:
        imgs = [np.full((8, 8, 3), v, np.uint8) for v in (10, 20, 30)]
        futs = [b.submit(im) for im in imgs]
        res = [f.result(timeout=5) for f in futs]
        for im, r in zip(imgs, res):
            assert r[0] == pytest.approx(im.mean())
        # 3 items never dispatch an 8-row batch: 4-row bucket (or a 2+2
        # split across windows) only
        assert all(len(batch) in (2, 4) for batch in eng.batches)
    finally:
        b.stop()


# ---------------------------------------------------------------------------
# end-to-end HTTP server over a real (random tiny) model


@pytest.fixture(scope="module")
def server():
    engine = ClassifierEngine(model="random:Tiny", batch_size=4, flat=True,
                              verbose=False)
    srv = PredictServer(engine, port=0, max_wait_ms=20.0, verbose=False)
    srv.serve_background()
    yield srv
    srv.stop()


def _post(port, path, body, ctype):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", path, body=body, headers={"Content-Type": ctype})
    r = conn.getresponse()
    out = (r.status, json.loads(r.read()))
    conn.close()
    return out


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", path)
    r = conn.getresponse()
    out = (r.status, json.loads(r.read()))
    conn.close()
    return out


def test_healthz(server):
    code, payload = _get(server.server_port, "/healthz")
    assert code == 200
    assert payload["status"] == "ok"          # warmed before serving
    assert payload["model"] == "random:Tiny"
    assert payload["batch_size"] == 4


def test_predict_raw_bytes(server):
    rng = np.random.default_rng(0)
    code, payload = _post(server.server_port, "/predict",
                          _jpeg_bytes(rng), "image/jpeg")
    assert code == 200
    (pred,) = payload["predictions"]
    topk = pred["topk"]
    assert len(topk) == 3
    probs = [r["prob"] for r in topk]
    assert probs == sorted(probs, reverse=True)
    assert all(0.0 <= p <= 1.0 for p in probs)
    assert isinstance(topk[0]["name"], str) and topk[0]["name"]


def test_predict_json_batch(server):
    rng = np.random.default_rng(1)
    blobs = [base64.b64encode(_jpeg_bytes(rng)).decode() for _ in range(3)]
    code, payload = _post(server.server_port, "/predict",
                          json.dumps({"images_b64": blobs}),
                          "application/json")
    assert code == 200
    assert len(payload["predictions"]) == 3
    for pred in payload["predictions"]:
        assert len(pred["topk"]) == 3


def test_predict_matches_engine_directly(server):
    """Served probs == engine.classify_batch on the same decoded image."""
    rng = np.random.default_rng(2)
    blob = _jpeg_bytes(rng)
    code, payload = _post(server.server_port, "/predict", blob, "image/jpeg")
    assert code == 200
    served = {r["label"]: r["prob"]
              for r in payload["predictions"][0]["topk"]}

    img = server.engine.decode_bytes(blob)
    direct = server.engine.classify_batch(img[None])[0]
    for label, prob in served.items():
        assert direct[label] == pytest.approx(prob, abs=1e-5)


def test_decode_bytes_native_path(server):
    """JPEG requests take the native memory decoder; its output stays
    within IDCT variance of the cv2 fallback, and decode_blobs agrees
    with per-blob decode_bytes."""
    from aihab_clip_tpu.native import native_mem_decode_available

    eng = server.engine
    rng = np.random.default_rng(7)
    blobs = [_jpeg_bytes(rng, size=40 + 8 * i) for i in range(3)]

    via_engine = eng.decode_bytes(blobs[0])
    via_cv2 = eng._decode_bytes_cv2(blobs[0])
    assert via_engine is not None and via_engine.shape == via_cv2.shape
    diff = np.abs(via_engine.astype(int) - via_cv2.astype(int))
    assert diff.mean() < 2.0 and np.percentile(diff, 99) <= 12

    if native_mem_decode_available():
        from aihab_clip_tpu.native import native_decode_resize_mem

        native_img = native_decode_resize_mem(blobs[0], eng.decode_dim)
        np.testing.assert_array_equal(via_engine, native_img)

    batch = eng.decode_blobs(blobs)
    assert len(batch) == 3
    for one, many in zip((eng.decode_bytes(b) for b in blobs), batch):
        np.testing.assert_array_equal(one, many)

    # a corrupt blob in the middle: others decode, it returns None
    mixed = eng.decode_blobs([blobs[0], b"garbage", blobs[2]])
    assert mixed[1] is None
    np.testing.assert_array_equal(mixed[0], batch[0])


def test_predict_bad_inputs(server):
    port = server.server_port
    # undecodable image -> per-image error, not a failed request
    code, payload = _post(port, "/predict", b"not an image", "image/jpeg")
    assert code == 200
    assert payload["predictions"][0] == {"error": "undecodable image"}
    # malformed JSON
    code, _ = _post(port, "/predict", b"{broken", "application/json")
    assert code == 400
    # bad base64
    code, _ = _post(port, "/predict",
                    json.dumps({"images_b64": ["!!!"]}), "application/json")
    assert code == 400
    # unknown route
    code, _ = _get(port, "/nope")
    assert code == 404


def test_concurrent_requests_coalesce(server):
    """Concurrent single-image posts share device batches."""
    rng = np.random.default_rng(3)
    blobs = [_jpeg_bytes(rng) for _ in range(8)]
    before = server.stats.snapshot(server.engine.batch_size)

    barrier = threading.Barrier(len(blobs))

    def fire(blob):
        barrier.wait()
        return _post(server.server_port, "/predict", blob, "image/jpeg")

    with ThreadPoolExecutor(len(blobs)) as pool:
        results = list(pool.map(fire, blobs))
    assert all(code == 200 for code, _ in results)

    after = server.stats.snapshot(server.engine.batch_size)
    new_images = after["images"] - before["images"]
    new_batches = after["batches"] - before["batches"]
    assert new_images == 8
    # batch_size=4: perfect coalescing = 2 batches; require better than
    # one-batch-per-image to prove the batcher actually coalesces
    assert new_batches < 8


def test_stats_endpoint(server):
    code, payload = _get(server.server_port, "/stats")
    assert code == 200
    assert payload["images"] >= 1 and payload["batches"] >= 1
    assert 0.0 < payload["mean_batch_fill"] <= 1.0
    assert "latency_ms" in payload


def test_cli_build_server():
    """The CLI wires args through to a working server."""
    from aihab_clip_tpu.tools.serve import build_server

    srv = build_server(["--model", "random:Tiny", "--port", "0",
                        "--batch_size", "2", "--flat", "--topk", "2"])
    try:
        srv.serve_background()
        rng = np.random.default_rng(4)
        code, payload = _post(srv.server_port, "/predict",
                              _jpeg_bytes(rng), "image/jpeg")
        assert code == 200
        assert len(payload["predictions"][0]["topk"]) == 2
    finally:
        srv.stop()


def test_binary_batch_framing_roundtrip():
    from aihab_clip_tpu.serving import _parse_binary_batch, encode_binary_batch

    blobs = [b"abc", b"", b"\x00\x01\x02\x03" * 100]
    assert _parse_binary_batch(encode_binary_batch(blobs)) == blobs
    with pytest.raises(ValueError):
        _parse_binary_batch(b"\x01")                      # truncated header
    with pytest.raises(ValueError):
        _parse_binary_batch(b"\x00\x00\x00\x00")          # zero images
    body = encode_binary_batch([b"abcd"])
    with pytest.raises(ValueError):
        _parse_binary_batch(body[:-1])                    # short blob data


def test_predict_binary_batch(server):
    """The binary wire returns the same predictions as the JSON wire
    for identical images (the payload-bound serving fix: no base64/JSON
    on the hot path)."""
    from aihab_clip_tpu.serving import encode_binary_batch

    rng = np.random.default_rng(2)
    raw = [_jpeg_bytes(rng) for _ in range(3)]
    code, bin_payload = _post(server.server_port, "/predict",
                              encode_binary_batch(raw),
                              "application/x-aihab-batch")
    assert code == 200
    code, json_payload = _post(
        server.server_port, "/predict",
        json.dumps({"images_b64": [base64.b64encode(b).decode()
                                   for b in raw]}),
        "application/json")
    assert code == 200
    assert bin_payload["predictions"] == json_payload["predictions"]

    code, err = _post(server.server_port, "/predict", b"\x02\x00\x00\x00",
                      "application/x-aihab-batch")
    assert code == 400 and "binary batch" in err["error"]
