"""Web UI (scripts/app.py): form render + generate + HTTP round-trip."""

import io
import os
import sys
import threading
import urllib.request

import numpy as np
import pytest

# oracle-parity / integration battery: minutes of compile; run with -m slow
pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.fixture(scope="module")
def app():
    from app import App
    from txt2img import parse_args

    opt = parse_args(["--tiny", "--prompt", "unused"])
    return App(opt)


def test_render_escapes_and_defaults(app):
    html = app.render({"prompt": 'x"><script>'})
    assert "<script>" not in html
    assert 'value="50"' in html  # default steps


def test_generate_strip(app):
    grid = app.generate({"prompt": "a photo of a z", "steps": 2,
                         "size": 64, "n_samples": 2})
    assert grid.shape == (64, 128, 3) and grid.dtype == np.uint8


def test_http_roundtrip(app):
    from http.server import ThreadingHTTPServer

    from app import make_handler

    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(app))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30).read().decode()
        assert "adaface-tpu" in page
        data = ("prompt=a photo of a z&neg_prompt=&steps=2&scale_hi=10"
                "&scale_lo=4&seed=0&size=64&n_samples=1&sampler=ddim"
                "&compel=2").encode()
        resp = urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=data),
            timeout=300).read().decode()
        assert "base64," in resp  # inline PNG result
    finally:
        srv.shutdown()


def test_settings_persist_roundtrip(app, tmp_path):
    """Every UI field survives a restart via the typed settings file (the
    `webuiParamClass.py` + `webui-setting-config.yaml` persistence,
    `app.py:51-56,173-191` — the reference only writes the seed back; here
    the whole form round-trips)."""
    from adaface_tpu.webui_params import load_settings

    from app import settings_to_form

    path = str(tmp_path / "webui-settings.yaml")
    app.settings_path = path
    try:
        app.generate({"prompt": "a z on a beach", "steps": 2, "size": 64,
                      "n_samples": 1, "seed": 77, "sampler": "plms"})
    finally:
        app.settings_path = None
    inf, _tr = load_settings(path)
    assert inf.seed == 77 and inf.ddim_steps == 2 and inf.H == 64
    assert inf.prompt == "a z on a beach" and inf.plms is True
    # a restarted App presents the persisted values as form defaults
    form = settings_to_form(inf)
    assert form["seed"] == 77 and form["steps"] == 2
    assert form["sampler"] == "plms"
