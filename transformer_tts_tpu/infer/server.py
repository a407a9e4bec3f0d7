"""Micro-batching HTTP synthesis server (stdlib-only).

Production-serving shape the reference lacks entirely (its test_*.py
scripts are offline batch-1 loops). Concurrent requests are coalesced by
a batcher thread into engine-sized batches (up to ``batch_window_ms`` of
gathering), so throughput under load approaches the batched-forward rate
while a lone request pays at most the window.

API (JSON over HTTP):

* ``POST /synthesize``  body ``{"text_ids": [int, ...]}`` or
  ``{"batch": [[int, ...], ...]}``, optional ``"speaker"``/``"speakers"``.
  Response: ``{"mel": [[...], ...], "mel_frames": T, "durations": [...],
  "ms": wall}`` (or a ``"results"`` list for batch requests).
* ``GET /healthz`` — engine status, buckets, compiled signatures.

The batcher takes any callable with the ``TTSEngine.synthesize``
signature, so the coalescing logic is unit-testable without a model.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional, Sequence


class _Pending:
    __slots__ = ("text", "speaker", "event", "result", "error")

    def __init__(self, text, speaker):
        self.text = text
        self.speaker = speaker
        self.event = threading.Event()
        self.result = None
        self.error: Optional[str] = None


class ServerFull(RuntimeError):
    """Queue at capacity — callers should surface 503."""


class MicroBatcher:
    """Coalesce concurrent single requests into batched synth calls.

    ``max_queue`` bounds admission: beyond it, ``submit`` raises
    :class:`ServerFull` immediately instead of letting latency grow
    without bound under overload (the HTTP layer maps it to 503).
    """

    def __init__(self, synth_fn: Callable, batch_size: int,
                 batch_window_ms: float = 5.0,
                 max_queue: Optional[int] = None):
        self._synth = synth_fn
        self._batch = int(batch_size)
        self._window = batch_window_ms / 1000.0
        self._q: "queue.Queue[_Pending]" = queue.Queue(
            maxsize=max_queue or 0)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        # metrics (read under the GIL; ints update atomically enough
        # for monitoring)
        self.n_requests = 0
        self.n_errors = 0
        self.n_rejected = 0
        self.n_batches = 0
        self.sum_batch_size = 0
        self.sum_wait_ms = 0.0

    def submit(self, text: Sequence[int],
               speaker: Optional[int] = None) -> dict:
        p = _Pending(list(text), speaker)
        t0 = time.time()
        try:
            self._q.put_nowait(p)
        except queue.Full:
            self.n_rejected += 1
            raise ServerFull(
                f"queue at capacity ({self._q.maxsize})") from None
        self.n_requests += 1
        p.event.wait()
        self.sum_wait_ms += (time.time() - t0) * 1000
        if p.error is not None:
            self.n_errors += 1
            raise RuntimeError(p.error)
        return p.result

    def close(self):
        self._stop.set()
        try:
            self._q.put_nowait(None)   # wake the loop
        except queue.Full:
            # queue saturated under overload: the loop is draining and
            # will observe _stop on its next get timeout / iteration
            pass
        self._thread.join(timeout=5)

    def _loop(self):
        while not self._stop.is_set():
            first = self._q.get()
            if first is None:
                continue
            group = [first]
            deadline = time.time() + self._window
            while len(group) < self._batch:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    break
                group.append(nxt)
            try:
                speakers = None
                if any(p.speaker is not None for p in group):
                    # None entries default inside the engine (speaker 0
                    # or the zero x-vector — `or 0` would mangle vectors)
                    speakers = [p.speaker for p in group]
                results = self._synth([p.text for p in group], speakers)
                self.n_batches += 1
                self.sum_batch_size += len(group)
                for p, r in zip(group, results):
                    p.result = r
                    p.event.set()
            except Exception as e:           # noqa: BLE001 — report to caller
                for p in group:
                    p.error = f"{type(e).__name__}: {e}"
                    p.event.set()


def _result_to_json(r: dict, *, wav: bool = False,
                    mel_dim: int = 80, sample_rate: int = 22050,
                    hop_length: int = 256) -> dict:
    mel = r["mel"]
    out = {
        "mel": [[round(float(v), 5) for v in frame] for frame in mel],
        "mel_frames": int(mel.shape[0]),
        "durations": [int(d) for d in r["durations"]],
    }
    if wav and mel.shape[0] > 0:
        # neural vocoder output when the engine carries one (r["audio"],
        # engine.py), Griffin-Lim fallback otherwise;
        # 16-bit PCM WAV, base64 over JSON
        import base64
        import io
        import wave as wave_mod
        import jax.numpy as jnp
        import numpy as np
        if "audio" in r:
            audio = np.asarray(r["audio"])
        else:
            from transformer_tts_tpu.ops.melspectrogram import (
                griffin_lim_from_log_mel)
            audio = np.asarray(griffin_lim_from_log_mel(
                jnp.asarray(mel, jnp.float32), sample_rate=sample_rate,
                hop_length=hop_length, n_mels=mel_dim))
        pcm = (np.clip(audio, -1.0, 1.0) * 32767).astype(np.int16)
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as fh:
            fh.setnchannels(1)
            fh.setsampwidth(2)
            fh.setframerate(sample_rate)
            fh.writeframes(pcm.tobytes())
        out["wav_base64"] = base64.b64encode(buf.getvalue()).decode()
        out["sample_rate"] = sample_rate
    return out


class TTSServer:
    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0,
                 batch_window_ms: float = 5.0,
                 max_queue: Optional[int] = 256):
        self.engine = engine
        self.batcher = MicroBatcher(engine.synthesize, engine.batch_size,
                                    batch_window_ms, max_queue=max_queue)
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):       # quiet by default
                pass

            def _reply(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _stream(self):
                """``POST /synthesize_stream``: JSON-lines over a
                close-delimited HTTP/1.0 response — one line per audio
                chunk as the engine produces it, a final ``done`` line
                with metadata. Body: ``{"text_ids": [...]}`` plus
                optional ``"speaker"``, ``"chunk_frames"``,
                ``"segment_steps"``. Streaming requests bypass the
                micro-batcher (latency- not throughput-oriented) and
                require the engine to carry a vocoder."""
                import base64
                import numpy as np
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    kw = {}
                    if req.get("chunk_frames"):
                        kw["chunk_frames"] = int(req["chunk_frames"])
                    if req.get("segment_steps"):
                        kw["segment_steps"] = int(req["segment_steps"])
                    events = server.engine.synthesize_streaming(
                        req["text_ids"], req.get("speaker"), **kw)
                    first = next(events)   # fail before headers if broken
                except Exception as e:     # noqa: BLE001 — HTTP boundary
                    self._reply(400, {"error": f"{type(e).__name__}: {e}"})
                    return
                t0 = time.time()
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                self.end_headers()

                def line(ev):
                    if ev["type"] == "audio":
                        pcm = (np.clip(ev["pcm"], -1.0, 1.0)
                               * 32767).astype("<i2")
                        out = {"start_sample": int(ev["start_sample"]),
                               "pcm16_base64":
                                   base64.b64encode(pcm.tobytes()).decode()}
                    elif ev["type"] == "mel":
                        out = {"start_frame": int(ev["start_frame"]),
                               "mel": [[round(float(v), 5) for v in fr]
                                       for fr in ev["mel"]]}
                    else:
                        out = {"done": True,
                               "mel_frames": int(ev["mel_frames"]),
                               "ms": round((time.time() - t0) * 1000, 2)}
                    self.wfile.write((json.dumps(out) + "\n").encode())
                    self.wfile.flush()

                try:
                    line(first)
                    for ev in events:
                        line(ev)
                except (BrokenPipeError, ConnectionResetError):
                    pass                   # client went away mid-stream

            def do_GET(self):
                if self.path == "/healthz":
                    self._reply(200, {
                        "ok": True,
                        "model": server.engine.hp.model,
                        "batch_size": server.engine.batch_size,
                        "text_buckets": list(server.engine.text_buckets),
                    })
                elif self.path == "/metrics":
                    b = server.batcher
                    n = max(b.n_requests, 1)
                    self._reply(200, {
                        "requests": b.n_requests,
                        "errors": b.n_errors,
                        "rejected": b.n_rejected,
                        "batches": b.n_batches,
                        "mean_batch_size": round(
                            b.sum_batch_size / max(b.n_batches, 1), 2),
                        "mean_latency_ms": round(b.sum_wait_ms / n, 2),
                        "queue_depth": b._q.qsize(),
                    })
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                if self.path == "/synthesize_stream":
                    self._stream()
                    return
                if self.path != "/synthesize":
                    self._reply(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    t0 = time.time()
                    jopts = dict(wav=bool(req.get("wav")),
                                 mel_dim=server.engine.hp.mel_dim)
                    if "batch" in req:
                        results = server.engine.synthesize(
                            req["batch"], req.get("speakers"))
                        payload = {
                            "results": [_result_to_json(r, **jopts)
                                        for r in results],
                            "ms": round((time.time() - t0) * 1000, 2)}
                    else:
                        r = server.batcher.submit(req["text_ids"],
                                                  req.get("speaker"))
                        payload = _result_to_json(r, **jopts)
                        payload["ms"] = round((time.time() - t0) * 1000, 2)
                    self._reply(200, payload)
                except ServerFull as e:
                    self._reply(503, {"error": str(e)})
                except Exception as e:       # noqa: BLE001 — HTTP boundary
                    self._reply(400, {"error": f"{type(e).__name__}: {e}"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._serve_thread: Optional[threading.Thread] = None

    def start(self):
        self._serve_thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True)
        self._serve_thread.start()

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        self.batcher.close()
        if self._serve_thread is not None:
            self._serve_thread.join(timeout=5)

    def serve_forever(self):
        self.httpd.serve_forever()
