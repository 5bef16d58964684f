"""Minimal production-style serving endpoint for zero-shot stylization.

The reference has no serving stack (SURVEY.md section 0); this provides the
deployment surface the TPU build targets: a threaded HTTP server with
micro-batching — concurrent requests within a window are stacked into one
device batch (per-image work is independent, so batching is free throughput).

    python -m mastermetastyletransfer_tpu.serve --checkpoint params.npz \
        --port 8500 --size 512 --ks 1,3

    POST /stylize with multipart or two raw images:
      curl -X POST localhost:8500/stylize \
           -F content=@cat.jpg -F style=@mondrian.jpg -o out.jpg
      # layer-count control (ZS-L1 vs ZS-L3, reference k):
      curl -X POST "localhost:8500/stylize?k=3" -F ... -o out.jpg
    GET /healthz -> {"status": "ok", ...}

    Style-lambda control sweep (BASELINE config #2; lambda selects a
    parameter set, reference pretrained_model_lambda_is_{2,4}.pt):
      --lambda_checkpoint lambda2=l2.npz --lambda_checkpoint lambda4=l4.npz
      POST /sweep?k=1 -> JSON {"lambda2": <base64 jpeg>, "lambda4": ...};
      one vmapped device call over the stacked parameter axis
      (inference.make_lambda_sweep_fn), not N serial runs.

    Style-locked serving (one style, many contents — the style swin pass
    and the k encoder triples are precomputed once per style at startup;
    each request pays only the content half of the pipeline):
      --locked_style vangogh=starry.jpg
      POST /stylize_locked?style=vangogh&k=1 -F content=@cat.jpg -o out.jpg

Stdlib-only HTTP (no external web framework in the image); JAX dispatch is
single-threaded behind a lock with request coalescing.
"""

from __future__ import annotations

import argparse
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Tuple

import numpy as np

from mastermetastyletransfer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def _drain_batch(q: "queue.Queue", first, max_batch: int, window_s: float):
    """Coalesce requests arriving within the micro-batch window (shared by
    StylizeService and LockedStyleService)."""
    batch = [first]
    deadline = time.time() + window_s
    while len(batch) < max_batch:
        timeout = deadline - time.time()
        if timeout <= 0:
            break
        try:
            batch.append(q.get(timeout=timeout))
        except queue.Empty:
            break
    return batch


class StylizeService:
    """Micro-batching wrapper over the jitted stylize fn."""

    def __init__(self, params, cfg, *, size: int = 512, k: int = 1,
                 max_batch: int = 8, window_ms: float = 5.0):
        import jax

        from mastermetastyletransfer_tpu.models.master import master_apply

        self.params = params
        self.cfg = cfg
        self.size = size
        self.max_batch = max_batch
        self.window_s = window_ms / 1000.0
        self._q: "queue.Queue[Tuple[np.ndarray, np.ndarray, queue.Queue]]" = (
            queue.Queue())

        def stylize(p, c, s):
            return master_apply(p, c, s, cfg, k=k, deterministic=True)

        self._fn = jax.jit(stylize)
        self._jax = jax
        threading.Thread(target=self._loop, daemon=True).start()

    def warmup(self):
        # compile the exact micro-batch shape the loop dispatches
        z = np.zeros((self.max_batch, self.size, self.size, 3), np.float32)
        self._run(z, z)

    def _run(self, content, style) -> np.ndarray:
        out = self._fn(self.params, content, style)
        return np.asarray(self._jax.device_get(out))

    def _loop(self):
        while True:
            batch = _drain_batch(self._q, self._q.get(), self.max_batch,
                                 self.window_s)
            contents = np.concatenate([b[0] for b in batch])
            styles = np.concatenate([b[1] for b in batch])
            # pad to max_batch so one shape compiles
            n = contents.shape[0]
            if n < self.max_batch:
                pad = self.max_batch - n
                contents = np.concatenate(
                    [contents, np.zeros((pad,) + contents.shape[1:], np.float32)])
                styles = np.concatenate(
                    [styles, np.zeros((pad,) + styles.shape[1:], np.float32)])
            try:
                outs = self._run(contents, styles)
                for i, (_, _, rq) in enumerate(batch):
                    rq.put(("ok", outs[i]))
            except Exception as e:  # surface device errors to the caller
                for _, _, rq in batch:
                    rq.put(("error", str(e)))

    def stylize(self, content: np.ndarray, style: np.ndarray,
                timeout: float = 60.0) -> np.ndarray:
        rq: queue.Queue = queue.Queue()
        self._q.put((content[None], style[None], rq))
        status, payload = rq.get(timeout=timeout)
        if status != "ok":
            raise RuntimeError(payload)
        return payload


class LockedStyleService:
    """Style-locked serving: the style's swin pass AND the k style-
    transformer encoder triples are computed ONCE per (style, k) at startup
    (models.encode_style_stream — exact, the encoder consumes only the
    style stream), so each request pays only content swin + transformer
    decoder + CNN decoder. This is the classic style-transfer serving
    workload (one style, many contents); the reference recomputes the full
    pair pipeline per request (codes/full_model.py:219-226).

    Requests micro-batch per (style, k): one dispatch thread per key, all
    serialized behind one device lock."""

    def __init__(self, params, cfg, styles: dict, *, size: int = 512,
                 ks: List[int] = (1,), max_batch: int = 8,
                 window_ms: float = 5.0, chunks: int = 1):
        import jax

        from mastermetastyletransfer_tpu.models.master import (
            encode_style_stream, stylize_with_style_stream,
        )

        self.params = params
        self.size = size
        self.max_batch = max_batch
        # chunks > 1: lax.scan over `chunks` max_batch-sized chunks inside
        # ONE jit call — under sustained load XLA overlaps chunk i+1's
        # content swin with chunk i's decoder (+4-6% locked throughput,
        # PERF.md r5 lever table; bench --mode locked --chunks A/B). The
        # dispatch shape is fixed at (chunks, max_batch, ...), so light
        # traffic pays padding — opt-in for throughput-bound deployments.
        self.chunks = max(1, int(chunks))
        self.window_s = window_ms / 1000.0
        self.names = list(styles.keys())
        self.ks = list(ks)
        self._jax = jax
        self._lock = threading.Lock()

        enc = {k: jax.jit(lambda p, s, k=k: encode_style_stream(
            p, s, cfg, k=k)) for k in self.ks}
        self._streams = {
            (name, k): enc[k](params, jnp_img[None])
            for name, img in styles.items()
            for jnp_img in [np.asarray(img, np.float32)]
            for k in self.ks
        }
        if self.chunks > 1:
            def _scan_fn(p, c, stream):
                def body(_, cb):
                    return None, stylize_with_style_stream(p, cb, stream, cfg)
                return jax.lax.scan(body, None, c)[1]
            self._fn = jax.jit(_scan_fn)
        else:
            self._fn = jax.jit(
                lambda p, c, stream: stylize_with_style_stream(p, c, stream,
                                                               cfg))

        self._queues = {key: queue.Queue() for key in self._streams}
        for key in self._streams:
            threading.Thread(target=self._loop, args=(key,),
                             daemon=True).start()

    def warmup(self):
        # Compile directly (bypassing the request queue and its 60s timeout):
        # a cold-cache compile takes 1-5 min on the target TPU, which would
        # time out the queued path and crash startup. One stream per k is
        # enough — the jitted fn is shared across styles of the same k.
        z = np.zeros((self.max_batch, self.size, self.size, 3), np.float32)
        if self.chunks > 1:
            z = np.broadcast_to(z, (self.chunks,) + z.shape).copy()
        for k in self.ks:
            stream = self._streams[(self.names[0], k)]
            with self._lock:
                out = self._fn(self.params, z, stream)
            self._jax.device_get(
                self._jax.tree_util.tree_leaves(out)[0].ravel()[0])

    def _loop(self, key):
        q = self._queues[key]
        stream = self._streams[key]
        while True:
            total = self.chunks * self.max_batch
            batch = _drain_batch(q, q.get(), total, self.window_s)
            contents = np.stack([b[0] for b in batch])
            n = contents.shape[0]
            if n < total:
                contents = np.concatenate(
                    [contents,
                     np.zeros((total - n,) + contents.shape[1:],
                              np.float32)])
            if self.chunks > 1:
                contents = contents.reshape(
                    (self.chunks, self.max_batch) + contents.shape[1:])
            try:
                with self._lock:
                    outs = self._fn(self.params, contents, stream)
                outs = np.asarray(self._jax.device_get(outs))
                if self.chunks > 1:
                    outs = outs.reshape((total,) + outs.shape[2:])
                for i, (_, rq) in enumerate(batch):
                    rq.put(("ok", outs[i]))
            except Exception as e:  # surface device errors to the caller
                for _, rq in batch:
                    rq.put(("error", str(e)))

    def stylize(self, content: np.ndarray, name: str, *, k: int,
                timeout: float = 60.0) -> np.ndarray:
        if (name, k) not in self._streams:
            raise KeyError(
                f"locked style ({name!r}, k={k}) not served "
                f"(styles: {self.names}, ks: {self.ks})")
        rq: queue.Queue = queue.Queue()
        self._queues[(name, k)].put((content, rq))
        status, payload = rq.get(timeout=timeout)
        if status != "ok":
            raise RuntimeError(payload)
        return payload


class SweepService:
    """Style-lambda sweep over stacked parameter sets, one vmap per call
    (inference.py's lambda axis), with per-k jitted fns."""

    def __init__(self, param_sets: dict, cfg, *, size: int, ks: List[int]):
        import jax

        from mastermetastyletransfer_tpu.inference import (
            make_lambda_sweep_fn, stack_params,
        )

        self.names = list(param_sets.keys())
        self.size = size
        self._stacked = stack_params([param_sets[n] for n in self.names])
        self._fns = {k: make_lambda_sweep_fn(cfg, k=k) for k in ks}
        self._jax = jax
        self._lock = threading.Lock()

    def warmup(self):
        z = np.zeros((1, self.size, self.size, 3), np.float32)
        for k in self._fns:
            self.sweep(z[0], z[0], k=k)

    def sweep(self, content: np.ndarray, style: np.ndarray, *, k: int) -> dict:
        if k not in self._fns:
            raise KeyError(f"k={k} not served (available: {list(self._fns)})")
        with self._lock:
            outs = self._fns[k](self._stacked, content[None], style[None])
        outs = np.asarray(self._jax.device_get(outs))  # (n_lambda, 1, H, W, 3)
        return {name: outs[i, 0] for i, name in enumerate(self.names)}


def _decode_to(size: int, data: bytes) -> np.ndarray:
    from PIL import Image

    with Image.open(io.BytesIO(data)) as im:
        im = im.convert("RGB").resize((size, size), Image.BILINEAR)
        return np.asarray(im, np.float32) / 255.0


def _encode_jpeg(img01: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.clip(img01 * 255, 0, 255).astype(np.uint8)).save(
        buf, "JPEG", quality=95)
    return buf.getvalue()


def _parse_multipart(body: bytes, boundary: bytes) -> dict:
    """Binary-safe multipart/form-data parser (content + style file fields).

    Splits on the full CRLF--boundary delimiter so part payloads are taken
    byte-exact (RFC 2046: the delimiter always follows a CRLF that belongs to
    it, and a conforming producer guarantees the delimiter never occurs inside
    encapsulated data) — no rstrip that could eat trailing payload bytes.
    """
    parts = {}
    chunks = (b"\r\n" + body).split(b"\r\n--" + boundary)
    for chunk in chunks[1:]:
        if chunk.startswith(b"--"):
            break  # closing delimiter "--boundary--"
        if chunk.startswith(b"\r\n"):
            chunk = chunk[2:]
        head, sep, payload = chunk.partition(b"\r\n\r\n")
        if not sep:
            continue
        for field in (b'name="content"', b'name="style"'):
            if field in head:
                parts[field.split(b'"')[1].decode()] = payload
    return parts


def make_handler(services: dict, sweep_service: Optional["SweepService"],
                 default_k: int,
                 locked_service: Optional["LockedStyleService"] = None):
    """services: {k: StylizeService} — same-k requests micro-batch together."""
    from urllib.parse import parse_qs, urlparse

    any_service = services[default_k]

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _reply(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                info = {"status": "ok", "size": any_service.size,
                        "max_batch": any_service.max_batch,
                        "ks": sorted(services),
                        "lambdas": (sweep_service.names
                                    if sweep_service else []),
                        "locked_styles": (locked_service.names
                                          if locked_service else [])}
                self._reply(200, json.dumps(info).encode(), "application/json")
            else:
                self._reply(404, b"not found", "text/plain")

        def _read_parts(self):
            length = int(self.headers["Content-Length"])
            body = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")
            if "multipart/form-data" not in ctype:
                return None
            boundary = (ctype.split("boundary=")[1].split(";")[0]
                        .strip().strip('"').encode())
            return _parse_multipart(body, boundary)

        def _read_pair(self):
            parts = self._read_parts()
            if parts is None or "content" not in parts or "style" not in parts:
                return None
            return (_decode_to(any_service.size, parts["content"]),
                    _decode_to(any_service.size, parts["style"]))

        def do_POST(self):
            url = urlparse(self.path)
            q = parse_qs(url.query)
            try:
                try:
                    k = int(q.get("k", [default_k])[0])
                except ValueError:
                    self._reply(400, b"k must be an integer", "text/plain")
                    return
                if url.path == "/stylize_locked":
                    if locked_service is None:
                        self._reply(400, b"no --locked_style styles loaded",
                                    "text/plain")
                        return
                    parts = self._read_parts()
                    if parts is None or "content" not in parts:
                        self._reply(400, b"expected multipart/form-data with "
                                    b"a 'content' part", "text/plain")
                        return
                    name = q.get("style", [locked_service.names[0]])[0]
                    content = _decode_to(locked_service.size,
                                         parts["content"])
                    try:
                        out = locked_service.stylize(content, name, k=k)
                    except KeyError as e:
                        self._reply(400, str(e).encode(), "text/plain")
                        return
                    self._reply(200, _encode_jpeg(out), "image/jpeg")
                    return
                pair = self._read_pair()
                if pair is None:
                    self._reply(400, b"expected multipart/form-data",
                                "text/plain")
                    return
                content, style = pair
                if url.path == "/stylize":
                    if k not in services:
                        self._reply(400, f"k={k} not served (ks="
                                    f"{sorted(services)})".encode(),
                                    "text/plain")
                        return
                    out = services[k].stylize(content, style)
                    self._reply(200, _encode_jpeg(out), "image/jpeg")
                elif url.path == "/sweep":
                    if sweep_service is None:
                        self._reply(400, b"no --lambda_checkpoint sets loaded",
                                    "text/plain")
                        return
                    import base64
                    try:
                        outs = sweep_service.sweep(content, style, k=k)
                    except KeyError as e:
                        # client error (unserved k), not a server fault —
                        # mirror /stylize's 400
                        self._reply(400, str(e).encode(), "text/plain")
                        return
                    payload = {name: base64.b64encode(
                        _encode_jpeg(img)).decode() for name, img in outs.items()}
                    self._reply(200, json.dumps(payload).encode(),
                                "application/json")
                else:
                    self._reply(404, b"not found", "text/plain")
            except Exception as e:
                self._reply(500, str(e).encode(), "text/plain")

    return Handler


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", default=None, help=".npz params export")
    ap.add_argument("--lambda_checkpoint", action="append", default=[],
                    metavar="NAME=PATH",
                    help="named lambda-tagged .npz param set for the /sweep "
                         "endpoint; repeatable (e.g. lambda2=l2.npz)")
    ap.add_argument("--locked_style", action="append", default=[],
                    metavar="NAME=IMAGE",
                    help="named style image locked at startup for the "
                         "/stylize_locked endpoint (style swin pass + k "
                         "encoder triples precomputed once; requests send "
                         "content only); repeatable")
    ap.add_argument("--port", type=int, default=8500)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--ks", default="1",
                    help="comma list of served transformer layer counts "
                         "(reference k; ZS-L1=1, ZS-L3=3)")
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--locked_chunks", type=int, default=1,
                    help="style-locked dispatch: scan this many max_batch "
                         "chunks inside one jit call (+4-6% sustained "
                         "throughput at 8, PERF.md r5; pads light traffic "
                         "to the full chunked shape - throughput-bound "
                         "deployments only)")
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--use_pallas", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="fused Pallas kernels (disable with --no-use_pallas)")
    ap.add_argument("--matmul_mode", choices=["native", "split3"],
                    default="native",
                    help="in-kernel matmul mode (ops/precision.py); "
                         "'split3' with --compute_dtype float32 serves the "
                         "accuracy-compliant (<=1e-3 MAE) operating point")
    args = ap.parse_args(argv)

    import jax

    if args.matmul_mode == "split3":
        if not args.use_pallas:
            raise SystemExit("--matmul_mode split3 requires --use_pallas "
                             "(split3 runs inside the Pallas kernels)")
        # XLA parts of the compliant point run 'high'; kdot shields the
        # Mosaic kernels from the ambient setting (ops/precision.py).
        jax.config.update("jax_default_matmul_precision", "high")

    from mastermetastyletransfer_tpu.config import ModelConfig
    from mastermetastyletransfer_tpu.models import init_master_model
    from mastermetastyletransfer_tpu.utils import checkpoint as ckpt_lib

    cfg = ModelConfig(compute_dtype=args.compute_dtype)
    if args.use_pallas:
        cfg = cfg.replace(swin=cfg.swin.replace(use_pallas=True),
                          transformer=cfg.transformer.replace(use_pallas=True),
                          decoder=cfg.decoder.replace(use_pallas=True))
    if args.matmul_mode != "native":
        cfg = cfg.replace(
            swin=cfg.swin.replace(matmul_mode=args.matmul_mode),
            transformer=cfg.transformer.replace(matmul_mode=args.matmul_mode),
            decoder=cfg.decoder.replace(matmul_mode=args.matmul_mode))
    params = init_master_model(jax.random.PRNGKey(0), cfg)
    if args.checkpoint:
        params = ckpt_lib.load_params_npz(args.checkpoint, params)

    ks = sorted({int(k) for k in args.ks.split(",")})
    services = {k: StylizeService(params, cfg, size=args.size, k=k,
                                  max_batch=args.max_batch) for k in ks}
    sweep_service = None
    if args.lambda_checkpoint:
        param_sets = {}
        for spec in args.lambda_checkpoint:
            name, _, path = spec.partition("=")
            if not path:
                raise SystemExit(f"--lambda_checkpoint wants NAME=PATH, got {spec!r}")
            param_sets[name] = ckpt_lib.load_params_npz(path, params)
        sweep_service = SweepService(param_sets, cfg, size=args.size, ks=ks)
    locked_service = None
    if args.locked_style:
        styles = {}
        for spec in args.locked_style:
            name, _, path = spec.partition("=")
            if not path:
                raise SystemExit(f"--locked_style wants NAME=IMAGE, got {spec!r}")
            with open(path, "rb") as f:
                styles[name] = _decode_to(args.size, f.read())
        locked_service = LockedStyleService(
            params, cfg, styles, size=args.size, ks=ks,
            max_batch=args.max_batch, chunks=args.locked_chunks)

    print(f"warming up ({args.size}x{args.size}, ks={ks}"
          f"{', sweep ' + str(sweep_service.names) if sweep_service else ''}"
          f"{', locked ' + str(locked_service.names) if locked_service else ''}"
          f")...")
    for s in services.values():
        s.warmup()
    if sweep_service:
        sweep_service.warmup()
    if locked_service:
        locked_service.warmup()
    server = ThreadingHTTPServer(
        ("0.0.0.0", args.port),
        make_handler(services, sweep_service, default_k=ks[0],
                     locked_service=locked_service))
    print(f"serving on :{args.port}  (POST /stylize[?k=N], POST /sweep[?k=N], "
          f"POST /stylize_locked[?style=NAME&k=N], GET /healthz)")
    server.serve_forever()


if __name__ == "__main__":
    main()
