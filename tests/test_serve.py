"""Serving endpoint tests: micro-batching service + HTTP roundtrip."""

import io
import threading
import urllib.error
import urllib.request

import jax
import numpy as np

from mastermetastyletransfer_tpu.config import ModelConfig
from mastermetastyletransfer_tpu.models import init_master_model
from mastermetastyletransfer_tpu.serve import (
    LockedStyleService, StylizeService, SweepService, make_handler,
)


def _service(size=64, max_batch=2):
    cfg = ModelConfig()
    params = init_master_model(jax.random.PRNGKey(0), cfg)
    svc = StylizeService(params, cfg, size=size, k=1, max_batch=max_batch,
                         window_ms=20.0)
    svc.warmup()
    return svc


def test_service_single_and_concurrent():
    svc = _service()
    r = np.random.default_rng(0)
    c = r.random((64, 64, 3)).astype(np.float32)
    s = r.random((64, 64, 3)).astype(np.float32)
    out = svc.stylize(c, s)
    assert out.shape == (64, 64, 3) and np.isfinite(out).all()

    # two concurrent requests coalesce into one batch
    results = {}

    def call(i):
        results[i] = svc.stylize(c, s)

    ts = [threading.Thread(target=call, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    np.testing.assert_allclose(results[0], results[1], atol=1e-5)


def test_http_roundtrip():
    from http.server import ThreadingHTTPServer
    from PIL import Image

    svc = _service()
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler({1: svc}, None, default_k=1))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert b"ok" in r.read()

        def jpeg_bytes(seed):
            rr = np.random.default_rng(seed)
            buf = io.BytesIO()
            Image.fromarray(rr.integers(0, 255, (80, 80, 3), dtype=np.uint8)
                            ).save(buf, "JPEG")
            return buf.getvalue()

        boundary = b"XBOUND"
        body = b""
        for name, data in [(b"content", jpeg_bytes(1)), (b"style", jpeg_bytes(2))]:
            body += (b"--" + boundary + b"\r\n"
                     b'Content-Disposition: form-data; name="' + name +
                     b'"; filename="x.jpg"\r\n'
                     b"Content-Type: image/jpeg\r\n\r\n" + data + b"\r\n")
        body += b"--" + boundary + b"--\r\n"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/stylize", data=body,
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary.decode()}"})
        with urllib.request.urlopen(req, timeout=120) as r:
            jpg = r.read()
        out = Image.open(io.BytesIO(jpg))
        assert out.size == (64, 64)
    finally:
        server.shutdown()


def _multipart_body(boundary=b"XBOUND"):
    from PIL import Image

    def jpeg_bytes(seed):
        rr = np.random.default_rng(seed)
        buf = io.BytesIO()
        Image.fromarray(rr.integers(0, 255, (80, 80, 3), dtype=np.uint8)
                        ).save(buf, "JPEG")
        return buf.getvalue()

    body = b""
    for name, data in [(b"content", jpeg_bytes(1)), (b"style", jpeg_bytes(2))]:
        body += (b"--" + boundary + b"\r\n"
                 b'Content-Disposition: form-data; name="' + name +
                 b'"; filename="x.jpg"\r\n'
                 b"Content-Type: image/jpeg\r\n\r\n" + data + b"\r\n")
    body += b"--" + boundary + b"--\r\n"
    return body


def test_http_k_routing_and_lambda_sweep():
    """Serving exposes the capabilities one module below (round-2 verdict
    weak #8): k selection per request and the vmapped lambda sweep."""
    import base64
    import json as jsonlib
    from http.server import ThreadingHTTPServer
    from PIL import Image

    cfg = ModelConfig()
    params = init_master_model(jax.random.PRNGKey(0), cfg)
    params2 = init_master_model(jax.random.PRNGKey(1), cfg)
    services = {k: StylizeService(params, cfg, size=64, k=k, max_batch=2,
                                  window_ms=5.0) for k in (1, 2)}
    sweep = SweepService({"lambda2": params, "lambda4": params2}, cfg,
                         size=64, ks=[1, 2])
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(services, sweep, default_k=1))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            info = jsonlib.loads(r.read())
        assert info["ks"] == [1, 2] and info["lambdas"] == ["lambda2", "lambda4"]

        boundary = b"XBOUND"
        body = _multipart_body(boundary)
        hdrs = {"Content-Type":
                f"multipart/form-data; boundary={boundary.decode()}"}

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/stylize?k=2", data=body, headers=hdrs)
        with urllib.request.urlopen(req, timeout=300) as r:
            assert Image.open(io.BytesIO(r.read())).size == (64, 64)

        # unserved k -> 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/stylize?k=9", data=body, headers=hdrs)
        try:
            urllib.request.urlopen(req, timeout=300)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # malformed k -> 400, not a dropped connection (r3 review finding)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/stylize?k=abc", data=body, headers=hdrs)
        try:
            urllib.request.urlopen(req, timeout=300)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # unserved sweep k -> 400 like /stylize (r3 review finding)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/sweep?k=9", data=body, headers=hdrs)
        try:
            urllib.request.urlopen(req, timeout=300)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/sweep?k=1", data=body, headers=hdrs)
        with urllib.request.urlopen(req, timeout=300) as r:
            payload = jsonlib.loads(r.read())
        assert set(payload) == {"lambda2", "lambda4"}
        imgs = {n: np.asarray(Image.open(io.BytesIO(base64.b64decode(b))))
                for n, b in payload.items()}
        assert imgs["lambda2"].shape == (64, 64, 3)
        # different parameter sets -> different stylizations
        assert not np.array_equal(imgs["lambda2"], imgs["lambda4"])
    finally:
        server.shutdown()


def test_locked_style_service_matches_pair_service():
    """Style-locked serving (stream precomputed once per style) returns the
    SAME stylization as the pair endpoint for the locked style, and the
    /stylize_locked HTTP route works content-only."""
    import json as jsonlib
    from http.server import ThreadingHTTPServer
    from PIL import Image

    cfg = ModelConfig()
    params = init_master_model(jax.random.PRNGKey(0), cfg)
    r = np.random.default_rng(0)
    style_img = r.random((64, 64, 3)).astype(np.float32)
    content = r.random((64, 64, 3)).astype(np.float32)

    pair = StylizeService(params, cfg, size=64, k=1, max_batch=2,
                          window_ms=5.0)
    locked = LockedStyleService(params, cfg, {"s0": style_img}, size=64,
                                ks=[1], max_batch=2, window_ms=5.0)
    want = pair.stylize(content, style_img)
    got = locked.stylize(content, "s0", k=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # chunked dispatch (r5: lax.scan over chunks inside one jit) returns
    # identical results through the same API
    chunked = LockedStyleService(params, cfg, {"s0": style_img}, size=64,
                                 ks=[1], max_batch=2, window_ms=5.0,
                                 chunks=2)
    got_c = chunked.stylize(content, "s0", k=1)
    np.testing.assert_allclose(got_c, want, rtol=1e-4, atol=1e-4)

    # unknown style / k -> KeyError
    import pytest
    with pytest.raises(KeyError):
        locked.stylize(content, "nope", k=1)

    server = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler({1: pair}, None, default_k=1, locked_service=locked))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as rr:
            assert jsonlib.loads(rr.read())["locked_styles"] == ["s0"]
        boundary = b"XB2"
        img = Image.fromarray((content * 255).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, "PNG")
        body = (b"--XB2\r\nContent-Disposition: form-data; name=\"content\"; "
                b"filename=\"c.png\"\r\n\r\n" + buf.getvalue() +
                b"\r\n--XB2--\r\n")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/stylize_locked?style=s0&k=1",
            data=body,
            headers={"Content-Type":
                     "multipart/form-data; boundary=XB2"})
        with urllib.request.urlopen(req, timeout=300) as rr:
            assert Image.open(io.BytesIO(rr.read())).size == (64, 64)
        # unknown locked style -> 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/stylize_locked?style=zz&k=1",
            data=body,
            headers={"Content-Type":
                     "multipart/form-data; boundary=XB2"})
        try:
            urllib.request.urlopen(req, timeout=300)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
