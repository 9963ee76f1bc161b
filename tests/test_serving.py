"""Serving: dynamic batching + HTTP endpoints (inference/serving.py).

Pins: (1) the batched predictor's payload matches the single-image
InferenceKeypointsModel pipeline (same decoded people, raw-image coords),
(2) concurrent submits coalesce into one device batch, (3) the HTTP server
answers /predict (npy + encoded image), /healthz, /stats, and rejects junk."""

import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_pose_tpu.inference import InferenceKeypointsModel
from human_pose_tpu.inference.serving import (
    BatchedKeypointsPredictor,
    DynamicBatcher,
    decode_request_body,
    make_server,
)
from human_pose_tpu.models import HigherHRNet

TINY = dict(num_blocks_per_stage=(1, 1, 1, 1), num_units=1)


@pytest.fixture(scope="module")
def predictor():
    model = HigherHRNet(num_kpts=17, C=8, num_deconv_resid_blocks=1, **TINY)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    im = InferenceKeypointsModel(
        model, dict(variables), input_size=128, max_num_people=5
    )
    return BatchedKeypointsPredictor(im)


def _image(seed, h=160, w=160):
    return (np.random.RandomState(seed).rand(h, w, 3) * 255).astype(np.uint8)


def test_batched_predict_matches_single_path(predictor):
    raw = _image(0)
    payload = predictor.predict([predictor.prepare(raw)])[0]
    ref = predictor.m(raw)  # the full single-image pipeline

    assert payload["num_people"] == len(ref.kpts_coords)
    got = np.asarray([p["keypoints"] for p in payload["people"]], np.float32)
    np.testing.assert_allclose(got[..., :2], ref.kpts_coords, atol=0.05)
    # payload coords/scores are rounded to 2 decimals -> atol 5e-3
    np.testing.assert_allclose(got[..., 2], ref.kpts_scores, atol=5e-3)


def test_predictor_warmup_compiles_po2_buckets(predictor):
    """warmup() must pre-run every power-of-two batch bucket predict() can
    form (both CLIs rely on it so live requests never wait on XLA)."""
    calls = []
    orig = predictor.predict
    try:
        predictor.predict = lambda reqs: calls.append(len(reqs)) or orig(reqs)
        predictor.warmup(_image(9), max_batch=3)
    finally:
        predictor.predict = orig
    assert calls == [1, 2, 4]  # max_batch=3 pads up to the 4-bucket


def test_batcher_coalesces_concurrent_requests(predictor):
    batcher = DynamicBatcher(predictor, max_batch=4, max_wait_ms=300.0)
    try:
        results = [None] * 3

        def run(i):
            results[i] = batcher.submit(_image(i))

        threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert all(r is not None for r in results)
        # same shape -> same bucket -> one batch of 3 (the long max_wait
        # guarantees coalescing regardless of scheduling)
        assert {r["batch_size"] for r in results} == {3}
        stats = batcher.stats()
        assert stats["requests"] == 3 and stats["batches"] == 1
        assert stats["mean_batch_size"] == 3.0
    finally:
        batcher.close()


def test_decode_request_body_npy_and_image():
    arr = _image(7, 32, 24)
    buf = io.BytesIO()
    np.save(buf, arr)
    np.testing.assert_array_equal(decode_request_body(buf.getvalue()), arr)

    import cv2

    ok, enc = cv2.imencode(".png", cv2.cvtColor(arr, cv2.COLOR_RGB2BGR))
    assert ok
    np.testing.assert_array_equal(decode_request_body(enc.tobytes()), arr)

    with pytest.raises(ValueError, match="neither"):
        decode_request_body(b"garbage bytes")

    # shape is right but dtype isn't: must 400, not silently normalize a
    # float [0,1] array as 0-255 pixels and return garbage with a 200
    buf = io.BytesIO()
    np.save(buf, arr.astype(np.float32) / 255.0)
    with pytest.raises(ValueError, match="uint8"):
        decode_request_body(buf.getvalue())


def test_http_server_end_to_end(predictor):
    batcher = DynamicBatcher(predictor, max_batch=2, max_wait_ms=1.0)
    server = make_server(batcher, host="127.0.0.1", port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        def get(path):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
                return r.status, json.loads(r.read())

        status, health = get("/healthz")
        assert status == 200 and health["status"] == "ok"

        buf = io.BytesIO()
        np.save(buf, _image(3))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert r.status == 200
        assert "people" in out and out["batch_size"] >= 1 and "latency_ms" in out
        for person in out["people"]:
            assert len(person["keypoints"]) == 17

        status, stats = get("/stats")
        assert status == 200 and stats["requests"] >= 1

        # Prometheus exposition mirrors the same counters
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
            assert r.status == 200
            assert "text/plain" in r.headers["Content-Type"]
            text = r.read().decode()
        assert "# TYPE serving_requests_total counter" in text
        assert f"serving_requests_total {stats['requests']}" in text
        assert "serving_mean_batch_size" in text

        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"junk", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(bad)
        assert exc.value.code == 400
    finally:
        server.shutdown()
        batcher.close()


def test_batcher_splits_mixed_shape_buckets(predictor):
    """Requests with different raw shapes coalesce into SEPARATE device
    batches (per shape bucket) within one drain window — both succeed."""
    batcher = DynamicBatcher(predictor, max_batch=4, max_wait_ms=300.0)
    try:
        results = {}

        def run(name, img):
            results[name] = batcher.submit(img)

        threads = [
            threading.Thread(target=run, args=("square", _image(0, 160, 160))),
            threading.Thread(target=run, args=("wide", _image(1, 120, 240))),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert set(results) == {"square", "wide"}
        assert all("people" in r for r in results.values())
        stats = batcher.stats()
        assert stats["requests"] == 2
        # distinct shape buckets -> they cannot share a device batch
        assert all(r["batch_size"] == 1 for r in results.values())
    finally:
        batcher.close()


def test_server_error_maps_to_503(predictor):
    """Server-side failures are 503 (retryable), not 400 (caller error)."""
    batcher = DynamicBatcher(predictor, max_batch=2, max_wait_ms=1.0)
    server = make_server(batcher, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    broken = lambda reqs: (_ for _ in ()).throw(RuntimeError("device gone"))
    orig = batcher.predictor.predict
    try:
        batcher.predictor.predict = broken
        buf = io.BytesIO()
        np.save(buf, _image(4))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(), method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 503
    finally:
        batcher.predictor.predict = orig
        server.shutdown()
        batcher.close()


def test_batcher_close_fails_fast(predictor):
    batcher = DynamicBatcher(predictor, max_batch=2, max_wait_ms=1.0)
    batcher.close()
    with pytest.raises(RuntimeError, match="closed"):
        batcher.submit(_image(5))


@pytest.fixture(scope="module")
def cls_predictor():
    from human_pose_tpu.inference import InferenceClassificationModel
    from human_pose_tpu.inference.serving import BatchedClassificationPredictor
    from human_pose_tpu.models import ClassificationHRNet

    model = ClassificationHRNet(C=8, num_classes=10, **TINY)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    im = InferenceClassificationModel(
        model, dict(variables), labels=[f"c{i}" for i in range(10)], input_size=64
    )
    return BatchedClassificationPredictor(im, top_k=3)


def test_batched_classification_matches_single_path(cls_predictor):
    """The classification serving payload's top-k agrees with the single-image
    InferenceClassificationModel pipeline on the same input."""
    raw = _image(11)
    payload = cls_predictor.predict([cls_predictor.prepare(raw)])[0]
    ref = cls_predictor.m(raw)

    assert len(payload["top"]) == 3
    order = np.argsort(-ref.probs, kind="stable")[:3]
    assert [t["label"] for t in payload["top"]] == [f"c{i}" for i in order]
    np.testing.assert_allclose(
        [t["prob"] for t in payload["top"]], ref.probs[order], atol=1e-5
    )
    assert payload["pred"] == f"c{order[0]}"


def test_classification_batching_pads_po2(cls_predictor):
    """3 coalesced requests run as one padded batch (pad rows sliced off) and
    each result matches its own single-request payload."""
    raws = [_image(20 + i) for i in range(3)]
    reqs = [cls_predictor.prepare(r) for r in raws]
    batched = cls_predictor.predict(reqs)
    singles = [cls_predictor.predict([q])[0] for q in reqs]
    for b, s in zip(batched, singles):
        assert b["pred"] == s["pred"]
        np.testing.assert_allclose(
            [t["prob"] for t in b["top"]],
            [t["prob"] for t in s["top"]], atol=1e-5,
        )


def test_http_classification_end_to_end(cls_predictor):
    """serve --task=classification: the HTTP layer is task-agnostic; the
    classification batcher returns top-k payloads over POST /predict."""
    batcher = DynamicBatcher(cls_predictor, max_batch=2, max_wait_ms=1.0)
    server = make_server(batcher, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        buf = io.BytesIO()
        np.save(buf, _image(12))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert r.status == 200
        assert len(out["top"]) == 3 and "pred" in out
        assert "latency_ms" in out and out["batch_size"] >= 1
    finally:
        server.shutdown()
        batcher.close()


def test_pending_settle_first_writer_wins():
    """A completed result can never be masked by a racing shutdown error
    (close()/late submit re-check go through the same settle gate)."""
    from human_pose_tpu.inference.serving import _Pending

    p = _Pending(req=None)
    assert p.settle(result={"people": []})
    assert not p.settle(error=RuntimeError("batcher is closed"))
    assert p.error is None and p.result == {"people": []}

    q = _Pending(req=None)
    assert q.settle(error=RuntimeError("boom"))
    assert not q.settle(result={"people": []})
    assert q.result is None and str(q.error) == "boom"


def test_timed_out_request_is_shed_not_computed(predictor):
    """A submit that times out must not still burn a device batch when the
    worker gets to it — overload has to actually shed load."""
    batcher = DynamicBatcher(predictor, max_batch=2, max_wait_ms=1.0)
    gate = threading.Event()
    orig = batcher.predictor.predict
    computed = []

    def slow_predict(reqs):
        gate.wait(30)
        computed.append(len(reqs))
        return orig(reqs)

    try:
        batcher.predictor.predict = slow_predict
        # first request occupies the worker inside slow_predict
        t1 = threading.Thread(target=lambda: batcher.submit(_image(6)))
        t1.start()
        import time as _t

        _t.sleep(0.3)  # worker is now parked in slow_predict
        # second request times out while still queued -> must be shed
        with pytest.raises(TimeoutError):
            batcher.submit(_image(7), timeout=0.2)
        gate.set()
        t1.join(timeout=120)
        # give the worker one drain cycle to observe the cancelled entry
        deadline = _t.time() + 5
        while batcher.stats()["shed"] < 1 and _t.time() < deadline:
            _t.sleep(0.05)
    finally:
        batcher.predictor.predict = orig
        batcher.close()
    assert batcher.stats()["shed"] == 1
    assert sum(computed) == 1  # only the live request hit the device


def test_http_body_size_limits(predictor):
    """Oversized bodies 413, bad/absent Content-Length 400 — read() must
    never buffer an attacker-chosen number of bytes."""
    batcher = DynamicBatcher(predictor, max_batch=2, max_wait_ms=1.0)
    server = make_server(batcher, host="127.0.0.1", port=0, max_body_bytes=1024)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        big = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"x" * 2048, method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(big)
        assert exc.value.code == 413

        # hand-rolled request: no Content-Length at all
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.putrequest("POST", "/predict", skip_accept_encoding=True)
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        conn.close()
    finally:
        server.shutdown()
        batcher.close()
