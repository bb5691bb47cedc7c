"""Minimal production-style HTTP serving front-end over the Predictor.

Endpoints (JSON responses; audio is raw WAV bytes in the request body):

    POST /embedding                 -> {"embedding": [...]}
    POST /contrast?other=<path>     -> {"score": s}     (body vs db file)
    POST /register?name=<user>      -> {"success": true}
    POST /recognition[?threshold=t] -> {"name": ..., "score": ...}
    GET  /users                     -> {"users": [...]}
    POST /diarization[?speakers=n&search_db=1&threshold=t]
                                    -> {"segments": [...]}

stdlib-only (ThreadingHTTPServer); the Predictor's jitted embed calls are
thread-safe (pure functions + GIL around the db mutations). For higher
load put this behind a real ASGI server — the TPU-side batching already
lives in ``Predictor.predict_batch``.

Usage: python tools/serve.py --configs=... --model_path=... [--port 8000]
"""

import argparse
import functools
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from voiceprintrecognition_paddlepaddle_tpu.predict import Predictor
from voiceprintrecognition_paddlepaddle_tpu.utils.utils import (
    add_arguments, print_arguments)

_db_lock = threading.Lock()


def _safe_user_name(name):
    """Reject names that could escape the audio_db directory (path
    traversal through ``os.path.join(audio_db_path, name)``). Unicode
    names (e.g. Chinese) stay allowed."""
    if not name or len(name) > 128:
        return False
    if any(c in name for c in ("/", "\\", "\x00")) or ".." in name:
        return False
    return not name.startswith(".")


def _safe_db_file(path, audio_db_path):
    """Only allow /contrast 'other' to reference files under audio_db."""
    root = os.path.realpath(audio_db_path)
    target = os.path.realpath(os.path.join(root, path))
    return target if os.path.commonpath([root, target]) == root else None


def make_handler(predictor, batcher=None):
    """``batcher`` (a ``MicroBatcher``) aggregates concurrent embed
    requests into single device batches — see
    ``infer_utils/micro_batcher.py``. ``None`` embeds per-request."""
    import numpy as np

    def _embed_many(audios):
        segs = [predictor._load_audio(a) for a in audios]
        if batcher is None:
            return [predictor.predict(s) for s in segs]
        futures = [batcher.embed_async(s.samples) for s in segs]
        return [f.result() for f in futures]

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload):
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self):
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n)

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/users":
                self._send(200, {"users": predictor.get_users()})
            elif path == "/stats":
                self._send(200, {
                    "batches": getattr(batcher, "batches", 0),
                    "items": getattr(batcher, "items", 0)})
            else:
                self._send(404, {"error": "unknown endpoint"})

        def do_POST(self):
            url = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            try:
                audio = self._body()
                if url.path == "/embedding":
                    emb = _embed_many([audio])[0]
                    self._send(200, {"embedding": emb.tolist()})
                elif url.path == "/contrast":
                    other = _safe_db_file(q["other"],
                                          predictor.audio_db_path)
                    if other is None or not os.path.isfile(other):
                        self._send(400, {"error": "'other' must name a "
                                                  "file inside audio_db"})
                        return
                    f1, f2 = _embed_many([audio, other])
                    score = predictor.cosine_score(f1, f2)
                    self._send(200, {"score": score})
                elif url.path == "/register":
                    if not _safe_user_name(q.get("name", "")):
                        self._send(400, {"error": "invalid user name"})
                        return
                    with _db_lock:
                        ok, msg = predictor.register(audio, q["name"])
                    self._send(200, {"success": bool(ok), "message": msg})
                elif url.path == "/recognition":
                    # per-request override; never mutates the shared
                    # predictor (threshold=0.0 is a valid accept-best)
                    thr = float(q["threshold"]) if "threshold" in q else None
                    emb = _embed_many([audio])[0]
                    with _db_lock:
                        name, score = predictor.retrieve(
                            emb[None], threshold=thr)[0]
                    self._send(200, {"name": name, "score": score})
                elif url.path == "/diarization":
                    spk = int(q["speakers"]) if "speakers" in q else None
                    search = q.get("search_db", "").lower() in (
                        "1", "true", "yes")
                    thr = (float(q["threshold"])
                           if "threshold" in q else None)
                    with _db_lock:
                        segs = predictor.speaker_diarization(
                            audio, speaker_num=spk, search_audio_db=search,
                            threshold=thr)
                    self._send(200, {"segments": segs})
                else:
                    self._send(404, {"error": "unknown endpoint"})
            except Exception as e:  # surface errors as JSON
                self._send(400, {"error": str(e)})

        def log_message(self, fmt, *args):
            pass  # quiet

    return Handler


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_arg = functools.partial(add_arguments, argparser=parser)
    add_arg("configs",       str,   "configs/cam++.yml", "config file path")
    add_arg("model_path",    str,   "models/CAMPPlus_Fbank/best_model/",
            "model directory")
    add_arg("audio_db_path", str,   "audio_db/", "voiceprint database")
    add_arg("threshold",     float, 0.6, "recognition threshold")
    add_arg("host",          str,   "127.0.0.1", "bind address")
    add_arg("port",          int,   8000, "port")
    add_arg("use_gpu",       bool,  True, "use the accelerator (TPU)")
    add_arg("data_parallel", bool,  False, "shard embedding batches over "
            "every local device (multi-chip TPU hosts)")
    add_arg("dynamic_batch_ms", float, 0.0, "aggregate concurrent embed "
            "requests for up to this many ms into one device batch "
            "(0 disables; 2-10 ms is typical — TPU throughput comes "
            "from batching)")
    add_arg("dynamic_batch_max", int, 64, "max clips per dynamic batch")
    add_arg("warmup_seconds", str,  "", "comma-separated durations (e.g. "
            "'3,5') to pre-compile the embed programs for before serving; "
            "compiles persist in .jax_cache, so this is one-time per "
            "machine")
    args = parser.parse_args(argv)
    print_arguments(args=args)

    predictor = Predictor(configs=args.configs, model_path=args.model_path,
                          audio_db_path=args.audio_db_path,
                          threshold=args.threshold, use_gpu=args.use_gpu,
                          data_parallel=args.data_parallel)
    if args.warmup_seconds.strip():
        import numpy as np
        sr = 16000
        for sec in args.warmup_seconds.split(","):
            dur = float(sec)
            print(f"warmup: compiling embed at {dur:g}s ...", flush=True)
            wave = np.zeros((int(sr * dur),), np.float32)
            wave[::321] = 0.05  # non-silent so VAD/normalize don't bail
            predictor.predict(wave)
        print("warmup done", flush=True)
    batcher = None
    if args.dynamic_batch_ms > 0:
        from voiceprintrecognition_paddlepaddle_tpu.infer_utils.\
            micro_batcher import MicroBatcher
        batcher = MicroBatcher(predictor, window_ms=args.dynamic_batch_ms,
                               max_batch=args.dynamic_batch_max)
        print(f"dynamic batching: {args.dynamic_batch_ms:g} ms window, "
              f"max {args.dynamic_batch_max}")
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(predictor, batcher))
    print(f"serving on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
