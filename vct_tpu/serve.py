"""Batching inference server — production serving for the captioner.

The reference has no serving story (its closest path is the one-shot
``predict_video.py`` CLI). For production TPU deployment the expensive thing
is per-request dispatch, so this server micro-batches: a worker thread drains
a request queue up to ``max_batch`` (or ``batch_timeout_ms``), pads the batch
to ONE static shape, and runs the single compiled KV-cached decode program —
each chip dispatch serves up to ``max_batch`` requests.

Endpoints (stdlib ``http.server``; JSON out):
  GET  /healthz            -> {"status": "ok", ...}
  POST /v1/caption         body = one video's features: ``.npy`` bytes (T, E)
                           for single-modality models, or ``.npz`` bytes with
                           one (T, E_m) array per modality for multi-modality
                           models (keys = the config's modal names, or
                           ``modal_0``, ``modal_1``, ...) -> {"caption": ...}
  POST /v1/caption_video   body = raw video bytes (ffmpeg-decodable)
                           -> {"caption": ...}   (needs --clip_weights;
                           single-CLIP-modality models only — the tower
                           produces exactly that modality)

Run: ``python -m vct_tpu.serve -c config.json -m ckpt --port 8000``
"""

from __future__ import annotations

import io
import json
import queue
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np


class ServerOverloadedError(RuntimeError):
    """The request queue is full — the caller should retry later (503)."""


class _Request:
    __slots__ = ("feats", "event", "caption", "error", "abandoned")

    def __init__(self, feats: List[np.ndarray]):
        self.feats = feats  # per-modality (T, E_m) float32, already oriented
        self.event = threading.Event()
        self.caption: Optional[str] = None
        self.error: Optional[str] = None
        self.abandoned = False  # client gave up; batcher skips it


class CaptionService:
    """Micro-batching captioner. Thread-safe ``caption_features`` /
    ``caption_video`` entry points; one background batcher thread."""

    def __init__(self, cfg, ckpt_path: str, *, clip_weights: Optional[str] = None,
                 max_batch: int = 32, batch_timeout_ms: float = 5.0,
                 max_queue: Optional[int] = None,
                 max_body_bytes: int = 64 * 1024 * 1024, log=print):
        import jax.numpy as jnp

        from vct_tpu.cli.common import load_checkpoint_into, make_trainer_pieces
        from vct_tpu.decode import make_auto_greedy_fn

        self.cfg = cfg
        self.log = log
        self.max_batch = max_batch
        self.batch_timeout = batch_timeout_ms / 1000.0
        self.model, self.tokenizer, variables = make_trainer_pieces(cfg)
        self.variables = load_checkpoint_into(variables, ckpt_path, log=log)
        # fused Pallas decode on TPU; module-graph fallback elsewhere.
        # tpu.beam_size > 1 serves beam search (fused kernels when eligible),
        # the same dispatch the Trainer's epoch eval uses.
        if cfg.tpu.beam_size > 1:
            from vct_tpu.decode import make_auto_beam_fn

            self.decode_fn = make_auto_beam_fn(
                self.model, cfg.test.max_length,
                self.tokenizer.start_id, self.tokenizer.end_id,
                cfg.tpu.beam_size,
            )
        else:
            self.decode_fn = make_auto_greedy_fn(
                self.model, cfg.test.max_length,
                self.tokenizer.start_id, self.tokenizer.end_id,
            )
        self._jnp = jnp

        self.clip_params = None
        self.tower_apply = None
        if clip_weights:
            import jax

            from vct_tpu.cli.predict import load_clip_params
            from vct_tpu.clip.vision import CLIPVisionTower

            self.clip_params = load_clip_params(clip_weights)
            tower = CLIPVisionTower()
            # jit ONCE (tower.apply is a fresh bound method per access), with
            # the params as a runtime argument — closure capture would embed
            # ~350 MB of weights as traced constants
            jitted = jax.jit(lambda params, px: tower.apply({"params": params}, px))
            self.tower_apply = lambda px: jitted(self.clip_params, px)
            # warm the tower for the default ext_type's frame count (uni_12)
            # like the decode program below: the ~350 MB ViT compile through
            # the relay takes minutes and would otherwise land inside the
            # first video request's timeout (other frame counts still
            # compile on first use)
            np.asarray(self.tower_apply(jnp.zeros((12, 224, 224, 3),
                                                  jnp.float32)))

        # compile + warm the decode program NOW so /healthz is truthful and
        # the first real requests don't burn their timeout on XLA compilation
        warm_f = [jnp.zeros((max_batch, cfg.tpu.max_frames, e), jnp.float32)
                  for e in cfg.model.modal_shape]
        warm_m = [jnp.zeros((max_batch, cfg.tpu.max_frames), bool)
                  for _ in cfg.model.modal_shape]
        np.asarray(self.decode_fn(self.variables, warm_f, warm_m)[0])

        # bounded: a burst beyond ~max_queue outstanding videos gets an
        # immediate 503 (ServerOverloadedError) instead of buffering feature
        # arrays in RAM until clients time out — memory stays O(max_queue)
        # regardless of offered load. 8 batches deep absorbs normal jitter
        # while the batcher drains max_batch per dispatch.
        self.max_queue = max_queue if max_queue is not None else 8 * max_batch
        self.max_body_bytes = max_body_bytes
        self._queue: "queue.Queue[_Request]" = queue.Queue(maxsize=self.max_queue)
        self._stop = threading.Event()
        self.stats = {"requests": 0, "batches": 0, "rejected": 0}
        # 'rejected' is bumped concurrently from handler threads; the other
        # two only from the single batcher thread — lock the shared one
        self._stats_lock = threading.Lock()
        self._worker = threading.Thread(target=self._batch_loop, daemon=True)
        self._worker.start()

    # -- public API ---------------------------------------------------------

    def _orient(self, feats: np.ndarray, e: int, what: str) -> np.ndarray:
        feats = np.asarray(feats, np.float32)
        if feats.ndim == 3 and feats.shape[0] == 1:  # leading batch dim
            feats = feats[0]
        if feats.ndim != 2:
            raise ValueError(f"{what}: expected 2-D features, got {feats.shape}")
        if feats.shape[0] == 0:
            raise ValueError(f"{what}: features contain no frames")
        # orientation by the known model dim, NOT the offline T<E heuristic:
        # long videos legitimately have T > E at a serving boundary
        if feats.shape[1] != e and feats.shape[0] == e:
            feats = feats.T
        if feats.shape[1] != e:
            raise ValueError(f"{what}: feature dim {feats.shape[1]} != model dim {e}")
        return feats

    def caption_features(self, feats, timeout: float = 60.0) -> str:
        """One video's features -> caption. Blocks until served.

        ``feats``: a (T, E) / (E, T) array for single-modality models, or a
        sequence of per-modality arrays matching ``model.modal_shape``.
        """
        shapes = self.cfg.model.modal_shape
        if not isinstance(feats, (list, tuple)):
            feats = [feats]
        if len(feats) != len(shapes):
            raise ValueError(
                f"model expects {len(shapes)} modalities, got {len(feats)}"
            )
        feats = [
            self._orient(f, e, f"modality {i}")
            for i, (f, e) in enumerate(zip(feats, shapes))
        ]
        if self._stop.is_set():
            raise RuntimeError("server shutting down")
        req = _Request(feats)
        try:
            self._queue.put_nowait(req)
        except queue.Full:
            with self._stats_lock:
                self.stats["rejected"] += 1
            raise ServerOverloadedError(
                f"request queue full ({self.max_queue} deep); retry later"
            ) from None
        if not req.event.wait(timeout):
            req.abandoned = True  # don't waste a batch slot on a gone client
            raise TimeoutError("caption request timed out")
        if req.error:
            raise RuntimeError(req.error)
        return req.caption

    def caption_video(self, video_bytes: bytes, ext_type: str = "uni_12",
                      timeout: float = 120.0) -> str:
        if self.tower_apply is None:
            raise ValueError("server started without --clip_weights; "
                             "send features to /v1/caption instead")
        from vct_tpu.clip import preprocess_frames, sample_frames

        if len(self.cfg.model.modal_shape) != 1:
            raise ValueError("/v1/caption_video serves single-CLIP-modality "
                             "models; send per-modality features to /v1/caption")
        with tempfile.NamedTemporaryFile(suffix=".mp4") as f:
            f.write(video_bytes)
            f.flush()
            frames = sample_frames(f.name, ext_type)
        pixels = preprocess_frames(frames)
        feats = np.asarray(self.tower_apply(self._jnp.asarray(pixels)))
        return self.caption_features(feats, timeout=timeout)

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5)
        # fail anything still queued so handler threads don't sit out their
        # full timeout against a dead worker
        while True:
            try:
                r = self._queue.get_nowait()
            except queue.Empty:
                break
            r.error = "server shutting down"
            r.event.set()

    # -- batcher ------------------------------------------------------------

    def _finish(self, batch: List["_Request"], tokens, n: int) -> None:
        """Materialize a launched decode and answer its requests. Async
        dispatch errors surface here, at fetch time."""
        from vct_tpu.decode import detokenize_batch

        try:
            captions = detokenize_batch(self.tokenizer, tokens)[:n]
            for r, c in zip(batch, captions):
                r.caption = c
            self.stats["requests"] += n
            self.stats["batches"] += 1
        except Exception as e:  # noqa: BLE001 - propagate per request
            for r in batch:
                r.error = f"{type(e).__name__}: {e}"
        finally:
            for r in batch:
                r.event.set()

    def _batch_loop(self):
        from vct_tpu.data.collate import fit_time_axis

        max_t = self.cfg.tpu.max_frames
        # One decode stays in flight: under load, group i+1 is collected and
        # LAUNCHED before group i's tokens are fetched, hiding the fetch
        # round trip (~35 ms on a relay-attached TPU) behind device compute
        # — the serving-side analogue of decode.pipelined_map. When traffic
        # pauses, the in-flight group is finished within ~1 ms.
        inflight = None
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.001 if inflight else 0.1)
            except queue.Empty:
                if inflight is not None:
                    self._finish(*inflight)
                    inflight = None
                continue
            batch: List[_Request] = [first]
            deadline = time.monotonic() + self.batch_timeout
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            batch = [r for r in batch if not r.abandoned]
            if not batch:
                continue
            try:
                n = len(batch)
                pad = self.max_batch - n
                feats_l, masks_l = [], []
                for m in range(len(self.cfg.model.modal_shape)):
                    fs, ms = zip(*(fit_time_axis(r.feats[m], max_t) for r in batch))
                    feats_l.append(self._jnp.asarray(np.stack(fs + (fs[0],) * pad)))
                    masks_l.append(self._jnp.asarray(np.stack(ms + (ms[0],) * pad)))
                tokens, _ = self.decode_fn(self.variables, feats_l, masks_l)
            except Exception as e:  # noqa: BLE001 - propagate per request
                for r in batch:
                    r.error = f"{type(e).__name__}: {e}"
                    r.event.set()
                # the previously launched group must still be answered —
                # without this, repeated dispatch failures under sustained
                # traffic would strand the in-flight clients until their
                # timeout fires
                if inflight is not None:
                    self._finish(*inflight)
                    inflight = None
                continue
            if inflight is not None:
                self._finish(*inflight)
            inflight = (batch, tokens, n)
        if inflight is not None:
            self._finish(*inflight)


def make_handler(service: CaptionService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok",
                                  "queued": service._queue.qsize(),
                                  **service.stats})
            else:
                self._reply(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                self._reply(400, {"error": "bad Content-Length"})
                self.close_connection = True
                return
            if length < 0:
                # a negative length would make rfile.read() slurp the socket
                # until EOF — unbounded RAM despite the cap below
                self._reply(400, {"error": "bad Content-Length"})
                self.close_connection = True
                return
            if length > service.max_body_bytes:
                # reject BEFORE reading: the body never enters RAM. The
                # connection must drop (unread bytes are still inbound).
                self._reply(413, {
                    "error": f"body {length} bytes exceeds limit "
                             f"{service.max_body_bytes}"})
                self.close_connection = True
                return
            body = self.rfile.read(length)
            try:
                if self.path.startswith("/v1/caption_video"):
                    caption = service.caption_video(body)
                elif self.path.startswith("/v1/caption"):
                    loaded = np.load(io.BytesIO(body), allow_pickle=False)
                    if hasattr(loaded, "files"):  # .npz: one array per modality
                        names = service.cfg.model.modal
                        feats = []
                        for i, name in enumerate(names):
                            key = (name if name in loaded.files
                                   else f"modal_{i}")
                            if key not in loaded.files:
                                raise ValueError(
                                    f"npz missing modality {name!r} "
                                    f"(keys: {loaded.files})")
                            feats.append(loaded[key])
                    else:
                        feats = loaded
                    caption = service.caption_features(feats)
                else:
                    self._reply(404, {"error": f"no route {self.path}"})
                    return
                self._reply(200, {"caption": caption})
            except ServerOverloadedError as e:
                self._reply(503, {"error": str(e), "retry": True})
            except TimeoutError as e:
                self._reply(503, {"error": str(e)})
            except ValueError as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


class _Server(ThreadingHTTPServer):
    # the stdlib default listen backlog (5) resets connections under a
    # concurrent burst well below max_queue; accept first, shed via 503
    request_queue_size = 128
    daemon_threads = True


def serve(cfg, ckpt_path: str, *, host="0.0.0.0", port=8000,
          clip_weights=None, max_batch=32, batch_timeout_ms=5.0,
          max_queue=None, max_body_bytes=64 * 1024 * 1024):
    service = CaptionService(cfg, ckpt_path, clip_weights=clip_weights,
                             max_batch=max_batch, batch_timeout_ms=batch_timeout_ms,
                             max_queue=max_queue, max_body_bytes=max_body_bytes)
    server = _Server((host, port), make_handler(service))
    server.service = service
    return server


def main(argv=None) -> None:
    import argparse

    from vct_tpu.cli.common import add_device_args, configure_hardware, load_config

    p = argparse.ArgumentParser(description="Batching caption server")
    p.add_argument("-c", "--config", required=True, type=str)
    p.add_argument("-m", "--model", required=True, type=str)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--clip_weights", type=str, default=None)
    p.add_argument("--max_batch", type=int, default=32)
    p.add_argument("--batch_timeout_ms", type=float, default=5.0)
    p.add_argument("--max_queue", type=int, default=None,
                   help="queued requests before 503 (default 8*max_batch)")
    p.add_argument("--max_body_mb", type=int, default=64,
                   help="request body cap in MiB before 413")
    add_device_args(p)
    args = p.parse_args(argv)
    configure_hardware(args)

    server = serve(load_config(args.config), args.model, host=args.host,
                   port=args.port, clip_weights=args.clip_weights,
                   max_batch=args.max_batch, batch_timeout_ms=args.batch_timeout_ms,
                   max_queue=args.max_queue,
                   max_body_bytes=args.max_body_mb * 1024 * 1024)
    print(f"serving on {args.host}:{args.port} (max_batch={args.max_batch})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.service.close()


if __name__ == "__main__":
    main()
