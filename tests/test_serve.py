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
def server(tmp_path_factory):
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
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


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
