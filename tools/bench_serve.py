"""Serving throughput/latency benchmark: drives the real HTTP server.

Starts ``pmhc_tpu.cli.serve_cli``'s server in-process on an ephemeral
port, fires concurrent clients at ``POST /sample`` (each request = one
npz entry -> one PDB), and reports sustained requests/s plus latency
percentiles. This measures the full production path: HTTP parse ->
micro-batch collection -> compiled sampler dispatch -> PDB
serialization -> response bytes.

The reference has no serving story (inference = one ``test.py``
process per run, re-initializing everything; ``/root/reference/
test.py:28-84``), so there is no baseline column — the numbers stand
against the offline pipeline's device ceiling (tools/bench_sampler.py).

Usage (real chip):
    python tools/bench_serve.py --backend g8 --bf16 --sample-steps 50 \
        --batch-size 64 --concurrency 128 --requests 512
"""

from __future__ import annotations

import argparse
import http.client
import io
import os
import statistics
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None,
                    help=".pth params (default: fresh random init — "
                         "throughput does not depend on the weights)")
    ap.add_argument("--batch-size", "-b", type=int, default=64)
    ap.add_argument("-T", type=int, default=1000)
    ap.add_argument("--sample-steps", type=int, default=None)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--fast-f32", action="store_true")
    ap.add_argument("--max-wait-ms", type=float, default=25.0)
    ap.add_argument("--concurrency", default="128",
                    help="concurrent client threads; a comma list sweeps "
                         "offered load against the same warm server "
                         "(latency-vs-load table, e.g. 8,32,64,96)")
    ap.add_argument("--requests", type=int, default=256,
                    help="total requests in the timed window")
    ap.add_argument("--warmup-requests", type=int, default=8)
    ap.add_argument("--max-queue", type=int, default=None,
                    help="pass through to serve_cli: cap the service "
                         "backlog (use a SMALL value + high concurrency "
                         "for an intentional over-capacity run — 503s "
                         "then show up bucketed as 'HTTP 503' in the "
                         "errors dict, separate from transport errors)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pmhc_tpu.cli.serve_cli import build_parser, create_server
    from pmhc_tpu.data import PmhcDataset, write_synthetic_hdf5
    from pmhc_tpu.serve import entry_from_dataset

    tmp = tempfile.mkdtemp(prefix="bench_serve_")
    model_path = args.model
    if model_path is None:
        from pmhc_tpu.models import ScoreNetworkConfig, init_score_network
        from pmhc_tpu.models.import_torch import export_torch_checkpoint

        params = init_score_network(
            jax.random.key(0),
            ScoreNetworkConfig(noise_step_count=args.T, backend="xla"))
        model_path = os.path.join(tmp, "model.pth")
        export_torch_checkpoint(params, model_path)

    cli = [model_path, "--port", "0", "--batch-size", str(args.batch_size),
           "-T", str(args.T), "--backend", args.backend,
           "--max-wait-ms", str(args.max_wait_ms)]
    if args.max_queue is not None:
        cli += ["--max-queue", str(args.max_queue)]
    if args.sample_steps:
        cli += ["--sample-steps", str(args.sample_steps)]
    if args.bf16:
        cli.append("--bf16")
    if args.fast_f32:
        cli.append("--fast-f32")
    server = create_server(build_parser().parse_args(cli))
    host, port = server.server_address
    threading.Thread(target=server.serve_forever, daemon=True).start()

    # request bodies: a few distinct entries, round-robined
    data_path = os.path.join(tmp, "entries.hdf5")
    write_synthetic_hdf5(data_path, n_entries=8, peptide_lengths=(9, 10, 11),
                         seed=11)
    ds = PmhcDataset(data_path)
    bodies = []
    for name in ds.entry_names:
        buf = io.BytesIO()
        np.savez(buf, **entry_from_dataset(ds, name))
        bodies.append(buf.getvalue())

    def post(body: bytes) -> float:
        t0 = time.perf_counter()
        conn = http.client.HTTPConnection(host, port, timeout=900)
        conn.request("POST", "/sample", body)
        resp = conn.getresponse()
        data = resp.read()
        conn.close()
        if resp.status != 200:
            raise RuntimeError(f"HTTP {resp.status}: {data[:200]!r}")
        if not data.rstrip().endswith(b"END"):
            raise RuntimeError("truncated PDB response")
        return time.perf_counter() - t0

    # warmup: first dispatch compiles the sampler (minutes cold)
    print(f"server on {host}:{port}; warmup ({args.warmup_requests} "
          f"requests, compiles on first dispatch) ...", flush=True)
    t0 = time.perf_counter()
    warm_threads = [threading.Thread(target=post, args=(bodies[i % len(bodies)],))
                    for i in range(args.warmup_requests)]
    for t in warm_threads:
        t.start()
    for t in warm_threads:
        t.join()
    print(f"warmup done in {time.perf_counter() - t0:.1f}s", flush=True)

    import json

    def run_level(conc: int, n_requests: int):
        latencies: list = []
        errors: dict = {}
        lock = threading.Lock()
        counter = iter(range(n_requests))

        def client():
            while True:
                with lock:
                    i = next(counter, None)
                if i is None:
                    return
                try:
                    dt = post(bodies[i % len(bodies)])
                    with lock:
                        latencies.append(dt)
                except Exception as e:  # noqa: BLE001 — bucket, keep going
                    kind = (str(e)[:8] if str(e).startswith("HTTP ")
                            else type(e).__name__)
                    with lock:
                        errors[kind] = errors.get(kind, 0) + 1

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client)
                   for _ in range(min(conc, n_requests))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        lat = sorted(latencies)
        q = lambda p: lat[min(len(lat) - 1, int(p * len(lat)))]
        print(json.dumps({
            "concurrency": conc, "ok": len(lat), "requests": n_requests,
            "wall_s": round(wall, 2),
            "requests_per_sec": round(len(lat) / wall, 2) if lat else 0.0,
            "p50_s": round(statistics.median(lat), 3) if lat else None,
            "p90_s": round(q(0.90), 3) if lat else None,
            "p99_s": round(q(0.99), 3) if lat else None,
            "max_s": round(lat[-1], 3) if lat else None,
            "errors": errors,
        }), flush=True)

    print(f"config: batch {args.batch_size}, T {args.T}, "
          f"steps {args.sample_steps or args.T}, backend {args.backend}, "
          f"bf16 {args.bf16}", flush=True)
    for conc in [int(c) for c in str(args.concurrency).split(",")]:
        run_level(conc, args.requests)

    server.batcher.close()
    server.shutdown()


if __name__ == "__main__":
    main()
