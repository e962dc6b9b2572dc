"""Batching inference server: HTTP contract + micro-batching behavior."""

import io
import json
import threading
from http.client import HTTPConnection

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from vct_tpu.serve import serve

from tests.test_cli import E_FEAT, T, workspace  # noqa: F401 (fixture reuse)


@pytest.fixture(scope="module")
def server(workspace):  # noqa: F811
    from vct_tpu.config import load_config
    from vct_tpu.train.loop import Trainer

    cfg = load_config(str(workspace / "config.json"))
    trainer = Trainer(cfg, log=lambda *_: None)
    trainer.save("_srv", 0)

    srv = serve(cfg, str(workspace / "ckpt" / "cli_srv"), host="127.0.0.1",
                port=0, max_batch=4, batch_timeout_ms=30.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.service.close()


def _post(srv, path: str, body: bytes):
    conn = HTTPConnection("127.0.0.1", srv.server_address[1], timeout=120)
    conn.request("POST", path, body=body)
    resp = conn.getresponse()
    return resp.status, json.loads(resp.read())


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def test_healthz(server):
    conn = HTTPConnection("127.0.0.1", server.server_address[1], timeout=30)
    conn.request("GET", "/healthz")
    resp = conn.getresponse()
    assert resp.status == 200
    assert json.loads(resp.read())["status"] == "ok"


def test_single_caption(server):
    rng = np.random.default_rng(0)
    status, payload = _post(server, "/v1/caption",
                            _npy_bytes(rng.standard_normal((T, E_FEAT)).astype(np.float32)))
    assert status == 200 and isinstance(payload["caption"], str)


def test_concurrent_requests_get_batched(server):
    rng = np.random.default_rng(1)
    results = [None] * 6
    before = dict(server.service.stats)

    def worker(i):
        arr = rng.standard_normal((T, E_FEAT)).astype(np.float32)
        results[i] = _post(server, "/v1/caption", _npy_bytes(arr))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(s == 200 for s, _ in results)
    served = server.service.stats["requests"] - before["requests"]
    batches = server.service.stats["batches"] - before["batches"]
    assert served == 6
    assert batches < 6  # at least some requests shared a device dispatch


def test_deterministic_same_input(server):
    arr = np.random.default_rng(2).standard_normal((T, E_FEAT)).astype(np.float32)
    (_, a), (_, b) = _post(server, "/v1/caption", _npy_bytes(arr)), _post(
        server, "/v1/caption", _npy_bytes(arr))
    assert a["caption"] == b["caption"]


def test_transposed_features_accepted(server):
    arr = np.random.default_rng(3).standard_normal((E_FEAT, T)).astype(np.float32)
    status, payload = _post(server, "/v1/caption", _npy_bytes(arr))
    assert status == 200 and isinstance(payload["caption"], str)


def test_bad_payloads(server):
    status, payload = _post(server, "/v1/caption", b"not an npy file")
    assert status in (400, 500) and "error" in payload
    # wrong feature dim
    status, payload = _post(
        server, "/v1/caption",
        _npy_bytes(np.zeros((T, E_FEAT + 1), np.float32)))
    assert status == 400 and "feature dim" in payload["error"]
    # unknown route
    status, payload = _post(server, "/v1/nope", b"")
    assert status == 404
    # caption_video without clip weights configured
    status, payload = _post(server, "/v1/caption_video", b"\x00\x01")
    assert status == 400 and "clip_weights" in payload["error"]


def test_long_video_features_accepted(server):
    """T > E is legitimate at a serving boundary (e.g. fps sampling of long
    clips); the server must subsample, not reject."""
    arr = np.random.default_rng(4).standard_normal((E_FEAT * 3, E_FEAT)).astype(np.float32)
    status, payload = _post(server, "/v1/caption", _npy_bytes(arr))
    assert status == 200 and isinstance(payload["caption"], str)


def test_single_frame_features_accepted(server):
    arr = np.random.default_rng(5).standard_normal((1, E_FEAT)).astype(np.float32)
    status, payload = _post(server, "/v1/caption", _npy_bytes(arr))
    assert status == 200


def test_close_fails_pending_requests():
    """close() must wake queued requests instead of letting them time out."""
    import queue as q

    from vct_tpu.serve import CaptionService, _Request

    svc = object.__new__(CaptionService)
    svc._queue = q.Queue()
    svc._stop = __import__("threading").Event()

    class _T:
        def join(self, timeout=None):
            pass

    svc._worker = _T()
    r = _Request(np.zeros((2, 2), np.float32))
    svc._queue.put(r)
    svc.close()
    assert r.event.is_set() and r.error == "server shutting down"
