"""Serving CLI — a persistent sampling server (no reference analogue:
the reference's only inference path re-initializes everything per
``test.py`` invocation, ``/root/reference/test.py:28-84``).

Keeps one compiled T-step sampler resident (``pmhc_tpu.serve``) and
serves HTTP requests, micro-batching concurrent requests into the
compiled batch shape:

- ``GET /healthz`` — JSON service status + compiled configuration.
- ``POST /sample`` — body: an ``.npz`` archive with the single-complex
  entry arrays (the ``PmhcDataset.get_entry`` contract plus the
  full-protein ``protein_aatype`` / ``protein_atom14_positions`` /
  ``protein_atom14_exists`` arrays; see
  ``pmhc_tpu.serve.ENTRY_SPECS``). Response: the sampled complex as PDB
  text (chains P + M, byte-identical to the offline CLI's writer).
  ``?samples=N`` returns N independent conformations as one
  multi-MODEL PDB.

Client example::

    buf = io.BytesIO(); np.savez(buf, **entry)
    conn = http.client.HTTPConnection(host, port)
    conn.request("POST", "/sample?samples=3", buf.getvalue())
    pdb_text = conn.getresponse().read()
"""

from __future__ import annotations

import io
import json
import logging
import sys
from argparse import ArgumentParser
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_log = logging.getLogger(__name__)

MAX_BODY = 64 << 20
RESULT_TIMEOUT_S = 900.0


def build_parser() -> ArgumentParser:
    p = ArgumentParser(description=__doc__)
    p.add_argument("model", help="model parameters file (.pth or orbax dir)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000,
                   help="0 picks an ephemeral port (printed on startup)")
    p.add_argument("--batch-size", "-b", type=int, default=64,
                   help="compiled batch shape; concurrent requests are "
                        "micro-batched into it")
    p.add_argument("--max-wait-ms", type=float, default=25.0,
                   help="micro-batching window: dispatch when the batch "
                        "is full or the oldest request has waited this long")
    p.add_argument("--debug", "-d", action="store_true")
    p.add_argument("-T", type=int, default=1000, help="number of noise steps")
    p.add_argument("--sample-steps", type=int, default=None,
                   help="strided few-step sampling (see the sample CLI)")
    p.add_argument("--backend", default="auto",
                   choices=("auto", "xla", "pallas", "pallas_lane", "g8",
                            "blockwise"))
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--fast-f32", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-samples", type=int, default=16,
                   help="cap on ?samples=N per request")
    p.add_argument("--max-queue", type=int, default=None,
                   help="bound on undispatched queued requests; beyond it "
                        "POST /sample returns 503 + Retry-After instead of "
                        "growing the backlog (default: 8x batch size; "
                        "0 = unbounded)")
    p.add_argument("--listen-backlog", type=int, default=128,
                   help="TCP listen(2) backlog. The http.server default "
                        "of 5 drops connections under bursty concurrent "
                        "load (kernel resets SYNs once the accept queue "
                        "overflows while handler threads hold the GIL)")
    p.add_argument("--aot", default=None, metavar="FILE",
                   help="AOT sampler artifact (pmhc_tpu.aot): load FILE "
                        "if it exists (skipping trace+lowering; the "
                        "configuration must match), else export it after "
                        "warmup so the next start is ahead-of-time")
    return p


def _load_params(model_path: str, noise_step_count: int, backend: str):
    import os

    from pmhc_tpu.models import import_torch_checkpoint

    if os.path.isdir(model_path):
        import jax
        import optax

        from pmhc_tpu.models import ScoreNetworkConfig, init_score_network
        from pmhc_tpu.train.checkpoints import CheckpointManager

        cfg = ScoreNetworkConfig(noise_step_count=noise_step_count,
                                 backend=backend)
        params_like = init_score_network(jax.random.key(0), cfg)
        opt_like = optax.adam(1e-3).init(params_like)
        params, _, _, step = CheckpointManager(model_path).restore(
            params_like, opt_like)
        _log.info("restored orbax checkpoint at step %d", step)
        return params
    return import_torch_checkpoint(model_path)


def create_server(args) -> ThreadingHTTPServer:
    """Build the warm service + HTTP server (separated from ``main`` so
    tests can drive the server lifecycle in-process)."""
    from pmhc_tpu.serve import (
        BatchingSampler, Overloaded, SamplerService, frame_models,
    )

    params = _load_params(args.model, args.T, args.backend)
    service = SamplerService(
        params,
        batch_size=args.batch_size,
        noise_step_count=args.T,
        num_steps=args.sample_steps,
        backend=args.backend,
        bf16=args.bf16,
        fast_f32=args.fast_f32,
        seed=args.seed,
    )
    import os

    if args.aot and os.path.exists(args.aot):
        from pmhc_tpu.aot import load_sampler

        load_sampler(args.aot, service)
        _log.info("loaded AOT sampler artifact %s", args.aot)
    _log.info("backend %s, batch %d: warming up (compiles on a cold "
              "cache)...", service.backend, service.batch_size)
    _log.info("warmup done in %.1fs", service.warmup())
    if args.aot and not os.path.exists(args.aot):
        from pmhc_tpu.aot import save_sampler

        save_sampler(service, args.aot)
    max_queue = (8 * service.batch_size if args.max_queue is None
                 else args.max_queue or None)
    batcher = BatchingSampler(service, max_wait_ms=args.max_wait_ms,
                              max_queue=max_queue)
    health = {
        "status": "ok",
        "backend": service.backend,
        "batch_size": service.batch_size,
        "noise_step_count": args.T,
        "sample_steps": args.sample_steps or args.T,
        "precision": ("bf16" if args.bf16
                      else "fast-f32" if args.fast_f32 else "f32"),
        "max_queue": max_queue,
    }
    max_samples = args.max_samples

    class Handler(BaseHTTPRequestHandler):
        server_version = "pmhc-tpu-serve/1.0"
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *a):  # route through logging
            _log.debug("http: " + fmt, *a)

        def _reply(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj) -> None:
            self._reply(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):  # noqa: N802 — http.server API
            if urlparse(self.path).path == "/healthz":
                self._json(200, health)
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):  # noqa: N802
            url = urlparse(self.path)
            if url.path != "/sample":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n_samples = int(
                    parse_qs(url.query).get("samples", ["1"])[0])
                if not 1 <= n_samples <= max_samples:
                    raise ValueError
            except ValueError:
                self._json(400, {"error": f"samples must be in "
                                          f"[1, {max_samples}]"})
                return
            length = int(self.headers.get("Content-Length", 0))
            if not 0 < length <= MAX_BODY:
                self._json(400, {"error": "missing or oversized body"})
                return
            body = self.rfile.read(length)
            try:
                with np.load(io.BytesIO(body)) as z:
                    entry = {k: z[k] for k in z.files}
            except Exception as e:  # noqa: BLE001 — client error
                self._json(400, {"error": f"body is not a readable npz: {e}"})
                return
            try:
                futures = batcher.submit_many([entry] * n_samples)
            except Overloaded as e:
                self.send_response(503)
                body = json.dumps({"error": str(e)}).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Retry-After", "1")
                self.end_headers()
                self.wfile.write(body)
                return
            try:
                pdbs = [f.result(timeout=RESULT_TIMEOUT_S) for f in futures]
            except ValueError as e:
                self._json(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 — server error
                _log.exception("sampling failed")
                self._json(500, {"error": f"sampling failed: {e}"})
                return
            self._reply(200, frame_models(pdbs), "chemical/x-pdb")

    class Server(ThreadingHTTPServer):
        # socketserver's default listen backlog of 5 resets connections
        # under bursty load (96 concurrent clients overflow the kernel
        # accept queue while the 1-CPU host is busy in handler threads);
        # measured: 44/256 transport errors at backlog 5, 0 at 128.
        request_queue_size = getattr(args, "listen_backlog", 128)

    server = Server((args.host, args.port), Handler)
    server.batcher = batcher  # for tests / clean shutdown
    return server


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        stream=sys.stdout, level=logging.DEBUG if args.debug else logging.INFO)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    server = create_server(args)
    _log.info("serving on http://%s:%d (POST /sample, GET /healthz)",
              *server.server_address)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.batcher.close()
        server.server_close()


if __name__ == "__main__":
    main()
