"""HTTP serving tests (FakeEngine session, ephemeral port)."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from retto_tpu.config import SessionConfig
from retto_tpu.ops.charset import CharacterDict
from retto_tpu.pipeline.engine import FakeEngine
from retto_tpu.pipeline.session import RettoSession
from retto_tpu.serve import make_server

CHARS = CharacterDict(["a", "b", "c"])


@pytest.fixture(scope="module")
def server():
    session = RettoSession(
        SessionConfig(),
        engine=FakeEngine(rec_classes=CHARS.num_classes),
        charset=CHARS,
    )
    srv = make_server(session, "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def png_bytes():
    arr = np.zeros((256, 320, 3), np.uint8)
    arr[60:90, 40:240] = 255
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz", timeout=30) as r:
        assert json.loads(r.read()) == {"ok": True}


def test_ocr_endpoint(server):
    req = urllib.request.Request(
        f"{server}/ocr", data=png_bytes(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        body = json.loads(r.read())
    assert set(body) == {"det_result", "cls_result", "rec_result"}
    assert body["rec_result"][0]["text"] == "ab"


def test_ocr_stream_ndjson(server):
    req = urllib.request.Request(
        f"{server}/ocr/stream", data=png_bytes(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        lines = [json.loads(l) for l in r.read().splitlines() if l.strip()]
    assert [l["stage"] for l in lines] == ["det", "cls", "rec"]
    assert lines[2]["result"][0]["text"] == "ab"


def test_bad_image_422(server):
    req = urllib.request.Request(
        f"{server}/ocr", data=b"not an image", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 422


def test_empty_body_400(server):
    req = urllib.request.Request(f"{server}/ocr", data=b"", method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400


def test_unknown_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(f"{server}/nope", timeout=30)
    assert ei.value.code == 404
