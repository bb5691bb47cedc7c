"""HTTP serving front-end: end-to-end over a live ThreadingHTTPServer."""

import io
import json
import threading
import urllib.request
import wave as wave_mod

import numpy as np
import pytest

SR = 16000


def _wav_bytes(freq, seconds=1.0, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * SR)) / SR
    sig = (0.3 * np.sin(2 * np.pi * freq * t)
           + 0.02 * rng.randn(len(t))).astype(np.float32)
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes((sig * 32767).astype("<i2").tobytes())
    return buf.getvalue()


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    from http.server import ThreadingHTTPServer

    from tests.test_predictor import _configs  # reuse tiny config builder
    from voiceprintrecognition_paddlepaddle_tpu.predict import Predictor
    from voiceprintrecognition_paddlepaddle_tpu.trainer import Trainer

    import tools.serve as serve

    root = tmp_path_factory.mktemp("serve")
    lines = []
    for spk in range(4):
        for u in range(3):
            p = root / f"s{spk}_{u}.wav"
            p.write_bytes(_wav_bytes(120 + spk * 70, seed=spk * 10 + u))
            lines.append(f"{p}\t{spk}")
    (root / "train_list.txt").write_text("\n".join(lines) + "\n",
                                         encoding="utf-8")
    cfg = _configs(root)
    Trainer(configs=cfg).train(save_model_path=str(root / "m"),
                               log_dir=None, do_eval=False)
    pred = Predictor(configs=cfg,
                     model_path=str(root / "m" / "TDNN_Fbank" / "last_model"),
                     audio_db_path=str(root / "db"), threshold=0.1)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve.make_handler(pred))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", pred
    httpd.shutdown()


@pytest.fixture(scope="module")
def server(stack):
    return stack[0]


def _post(url, body=b""):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_embedding_endpoint(server):
    out = _post(f"{server}/embedding", _wav_bytes(120))
    assert len(out["embedding"]) == 32


def test_register_recognise_users(server):
    assert _post(f"{server}/register?name=alice",
                 _wav_bytes(120, seed=1))["success"]
    assert _post(f"{server}/register?name=bob",
                 _wav_bytes(330, seed=2))["success"]
    with urllib.request.urlopen(f"{server}/users", timeout=30) as r:
        users = json.loads(r.read())["users"]
    assert sorted(set(users)) == ["alice", "bob"]
    out = _post(f"{server}/recognition", _wav_bytes(120, seed=3))
    assert out["name"] in ("alice", "bob")


def test_error_is_json(server):
    import urllib.error
    try:
        _post(f"{server}/recognition", b"not a wav")
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.loads(e.read())


def _expect_400(url, body=b""):
    import urllib.error
    try:
        _post(url, body)
    except urllib.error.HTTPError as e:
        assert e.code == 400
        return json.loads(e.read())
    raise AssertionError(f"expected HTTP 400 for {url}")


def test_register_rejects_path_traversal(server):
    import urllib.parse
    for bad in ("../evil", "a/b", "..", ".hidden", "a\\b"):
        q = urllib.parse.quote(bad, safe="")
        out = _expect_400(f"{server}/register?name={q}", _wav_bytes(120))
        assert "error" in out


def test_contrast_restricted_to_audio_db(server):
    import urllib.parse
    for bad in ("../../etc/passwd", "/etc/passwd"):
        q = urllib.parse.quote(bad, safe="")
        out = _expect_400(f"{server}/contrast?other={q}", _wav_bytes(120))
        assert "error" in out


def test_predictor_register_rejects_separators(server):
    # defence in depth below the HTTP layer
    from tests.test_predictor import _configs  # noqa: F401 (import check)
    # reach into the running predictor via a fresh registration name
    out = _expect_400(f"{server}/register?name=", _wav_bytes(120))
    assert "error" in out


@pytest.fixture(scope="module")
def batched_server(stack):
    """Same predictor behind a second server with dynamic micro-batching
    (generous 150 ms window so CI thread scheduling reliably aggregates)."""
    from http.server import ThreadingHTTPServer

    import tools.serve as serve
    from voiceprintrecognition_paddlepaddle_tpu.infer_utils.micro_batcher \
        import MicroBatcher

    _, pred = stack
    batcher = MicroBatcher(pred, window_ms=150.0, max_batch=32)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                serve.make_handler(pred, batcher))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", batcher
    httpd.shutdown()


def test_dynamic_batching_matches_unbatched(server, batched_server):
    """Concurrent requests ride one device batch and return the same
    embeddings as the per-request server."""
    burl, batcher = batched_server
    bodies = [_wav_bytes(110 + 25 * i, seconds=1.0, seed=40 + i)
              for i in range(10)]
    solo = [np.asarray(_post(f"{server}/embedding", b)["embedding"])
            for b in bodies]

    results = [None] * len(bodies)
    errors = []

    def hit(i):
        try:
            results[i] = np.asarray(
                _post(f"{burl}/embedding", bodies[i])["embedding"])
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    threads = [threading.Thread(target=hit, args=(i,))
               for i in range(len(bodies))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    for got, want in zip(results, solo):
        assert np.allclose(got, want, atol=1e-4)
    # aggregation actually happened: fewer device batches than requests
    assert batcher.items >= len(bodies)
    assert batcher.batches < batcher.items


def test_batched_contrast_and_recognition(batched_server):
    burl, _ = batched_server
    assert _post(f"{burl}/register?name=carol",
                 _wav_bytes(205, seed=77))["success"]
    out = _post(f"{burl}/recognition", _wav_bytes(205, seed=78))
    assert out["name"] is None or isinstance(out["name"], str)
    score = _post(f"{burl}/contrast?other=carol/0.wav",
                  _wav_bytes(205, seed=78))["score"]
    assert -1.0 <= score <= 1.0
    with urllib.request.urlopen(f"{burl}/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["items"] >= 1 and stats["batches"] >= 1


def test_microbatcher_dispatches_one_device_batch_above_32(stack):
    """A window larger than predict_batch's default batch_size (32) must
    reach the predictor as ONE call covering the whole window."""
    from voiceprintrecognition_paddlepaddle_tpu.infer_utils.micro_batcher \
        import MicroBatcher

    _, pred = stack
    calls = []
    real = pred.predict_batch

    def spy(audios, **kw):
        calls.append((len(audios), kw.get("batch_size")))
        return real(audios, **kw)

    pred.predict_batch = spy
    try:
        batcher = MicroBatcher(pred, window_ms=300.0, max_batch=40)
        futs = [batcher.embed_async(
            np.random.RandomState(i).randn(16000).astype(np.float32))
            for i in range(36)]
        embs = [f.result(timeout=120) for f in futs]
    finally:
        pred.predict_batch = real
    assert all(e.shape[-1] > 0 for e in embs)
    # every dispatched window declared a batch_size covering max_batch,
    # so no window was silently re-split into 32-clip device batches
    assert calls and all(bs == 40 for _, bs in calls)
    assert max(n for n, _ in calls) > 32


def test_recognition_threshold_is_per_request(server, stack):
    """A threshold query param must not leak into the shared predictor,
    and threshold=0 (accept best match) must be honored."""
    _, pred = stack
    body = _wav_bytes(130, seed=5)
    _post(f"{server}/register?name=dana", body)
    before = pred.threshold

    # impossible threshold for THIS request only -> no match
    out = _post(f"{server}/recognition?threshold=1.01", body)
    assert out["name"] is None
    assert pred.threshold == before  # no leak into the shared predictor

    # un-parameterized request still matches at the configured threshold
    out = _post(f"{server}/recognition", body)
    assert out["name"] == "dana"

    # threshold=0 is a valid accept-best, not a dropped falsy value
    out = _post(f"{server}/recognition?threshold=0", _wav_bytes(500, seed=9))
    assert out["name"] is not None
