"""Serving subsystem: micro-batching sampler service + HTTP front-end.

The reference has no serving path (its inference surface is the
``test.py`` CLI, re-initialized per invocation); ``pmhc_tpu.serve``
keeps one compiled sampler resident and packs concurrent requests into
its batch shape. These tests run the real service end-to-end on the
virtual-CPU backend with a tiny T.
"""

import http.client
import io
import json
import threading

import jax
import numpy as np
import pytest

from pmhc_tpu.data import PmhcDataset, write_synthetic_hdf5
from pmhc_tpu.models import ScoreNetworkConfig, init_score_network
from pmhc_tpu.serve import (
    BatchingSampler, SamplerService, entry_from_dataset, frame_models,
    validate_entry,
)

T = 6


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve")
    path = str(d / "serve.hdf5")
    write_synthetic_hdf5(path, n_entries=3, peptide_lengths=(9, 10), seed=7)
    return PmhcDataset(path)


@pytest.fixture(scope="module")
def params():
    cfg = ScoreNetworkConfig(noise_step_count=T, backend="xla")
    return init_score_network(jax.random.key(0), cfg)


@pytest.fixture(scope="module")
def service(params):
    svc = SamplerService(
        params, batch_size=2, noise_step_count=T, backend="xla", seed=3)
    svc.warmup()
    return svc


def _check_pdb(data: bytes):
    text = data.decode()
    atom_lines = [l for l in text.splitlines() if l.startswith("ATOM")]
    assert len(atom_lines) > 50
    assert {l[21] for l in atom_lines} == {"P", "M"}
    coords = np.array(
        [[float(l[30:38]), float(l[38:46]), float(l[46:54])]
         for l in atom_lines])
    assert np.isfinite(coords).all()
    assert text.rstrip().endswith("END")
    return atom_lines


def test_sample_entries_deterministic(service, dataset):
    entries = [entry_from_dataset(dataset, n) for n in dataset.entry_names[:2]]
    key = jax.random.key(42)
    a = service.sample_entries(entries, key)
    b = service.sample_entries(entries, key)
    assert len(a) == 2
    for pa, pb in zip(a, b):
        _check_pdb(pa)
        assert pa == pb  # same key + same batch -> identical bytes


def test_sample_entries_partial_batch_padding(service, dataset):
    # 1 real entry in a batch-2 service: pad rows must not leak into output
    e = entry_from_dataset(dataset, dataset.entry_names[0])
    out = service.sample_entries([e], jax.random.key(1))
    assert len(out) == 1
    _check_pdb(out[0])


def test_batching_sampler_concurrent(service, dataset):
    # 5 concurrent requests through a batch-2 service -> >= 3 batches;
    # every future resolves to a valid, entry-matched PDB
    entries = [entry_from_dataset(dataset, n) for n in dataset.entry_names]
    batcher = BatchingSampler(service, max_wait_ms=10.0)
    try:
        futs = [batcher.submit(entries[i % len(entries)]) for i in range(5)]
        pdbs = [f.result(timeout=300) for f in futs]
    finally:
        batcher.close()
    lens = []
    for i, p in enumerate(pdbs):
        atoms = _check_pdb(p)
        lens.append(len(atoms))
    # entry i%3 alternates peptide length 9/10 -> different atom counts
    assert lens[0] == lens[3] and lens[1] == lens[4]


def test_batching_sampler_rejects_bad_entry(service, dataset):
    batcher = BatchingSampler(service, max_wait_ms=5.0)
    try:
        bad = entry_from_dataset(dataset, dataset.entry_names[0])
        bad.pop("pocket_frames")
        fut = batcher.submit(bad)
        with pytest.raises(ValueError, match="pocket_frames"):
            fut.result(timeout=10)
        # a bad entry must not poison the service for later requests
        good = entry_from_dataset(dataset, dataset.entry_names[0])
        _check_pdb(batcher.submit(good).result(timeout=300))
    finally:
        batcher.close()


def test_validate_entry_shape_error(dataset):
    e = entry_from_dataset(dataset, dataset.entry_names[0])
    e["frames"] = e["frames"][:, :6]
    with pytest.raises(ValueError, match="frames"):
        validate_entry(e)


def test_frame_models():
    single = frame_models([b"ATOM x\nEND\n"])
    assert single == b"ATOM x\nEND\n"
    multi = frame_models([b"ATOM a\nEND\n", b"ATOM b\nEND\n"])
    text = multi.decode()
    assert text.count("MODEL") == 2 and text.count("ENDMDL") == 2
    assert text.rstrip().endswith("END")


def test_http_server_end_to_end(tmp_path, params, dataset):
    from pmhc_tpu.cli.serve_cli import build_parser, create_server
    from pmhc_tpu.models.import_torch import export_torch_checkpoint

    model_path = str(tmp_path / "serve_model.pth")
    export_torch_checkpoint(params, model_path)

    args = build_parser().parse_args([
        model_path, "--port", "0", "--batch-size", "2", "-T", str(T),
        "--backend", "xla", "--max-wait-ms", "5",
    ])
    server = create_server(args)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address
    try:
        conn = http.client.HTTPConnection(host, port, timeout=300)

        conn.request("GET", "/healthz")
        resp = conn.getresponse()
        health = json.loads(resp.read())
        assert resp.status == 200
        assert health["status"] == "ok"
        assert health["batch_size"] == 2
        assert health["backend"] == "xla"

        entry = entry_from_dataset(dataset, dataset.entry_names[0])
        buf = io.BytesIO()
        np.savez(buf, **entry)
        body = buf.getvalue()

        conn.request("POST", "/sample", body)
        resp = conn.getresponse()
        data = resp.read()
        assert resp.status == 200, data
        _check_pdb(data)

        # multi-conformation: one multi-MODEL PDB
        conn.request("POST", "/sample?samples=2", body)
        resp = conn.getresponse()
        data = resp.read()
        assert resp.status == 200, data
        assert data.decode().count("MODEL") == 2

        # malformed body -> 400, not a server fault
        conn.request("POST", "/sample", b"not an npz")
        resp = conn.getresponse()
        assert resp.status == 400
        assert b"npz" in resp.read()

        # bad entry -> 400 with the validation message
        bad = dict(entry)
        bad.pop("mask")
        buf = io.BytesIO()
        np.savez(buf, **bad)
        conn.request("POST", "/sample", buf.getvalue())
        resp = conn.getresponse()
        assert resp.status == 400
        assert b"mask" in resp.read()

        conn.close()
    finally:
        server.shutdown()
        thread.join(timeout=30)
        server.batcher.close()
        server.server_close()


def test_overload_backpressure_bounded_queue(service, dataset):
    """Sustained submit rate above the device rate: accepted requests all
    resolve, the undispatched backlog never exceeds max_queue, and excess
    submits fail fast with Overloaded (VERDICT r3 next #8)."""
    from pmhc_tpu.serve import Overloaded

    batcher = BatchingSampler(service, max_wait_ms=1.0, max_queue=4)
    try:
        entry = entry_from_dataset(dataset, dataset.entry_names[0])
        accepted, rejected = [], 0
        for _ in range(64):
            try:
                accepted.append(batcher.submit(entry))
            except Overloaded:
                rejected += 1
            assert batcher._q.qsize() <= 4
        assert rejected > 0, "flood of 64 should overflow max_queue=4"
        assert accepted, "some requests must be accepted"
        for fut in accepted:
            _check_pdb(fut.result(timeout=300))
    finally:
        batcher.close()


def test_close_resolves_all_queued_futures(service, dataset):
    """close() with a queued backlog drains it: every accepted future is
    resolved (result or exception) — none left hanging."""
    batcher = BatchingSampler(service, max_wait_ms=1000.0)
    entry = entry_from_dataset(dataset, dataset.entry_names[0])
    futures = [batcher.submit(entry) for _ in range(7)]
    batcher.close()
    for fut in futures:
        assert fut.done(), "close() left a queued future unresolved"
        _check_pdb(fut.result(timeout=0))
    # and submitting after close is a clean error
    with pytest.raises(RuntimeError, match="closed"):
        batcher.submit(entry)


def test_http_503_on_overload(tmp_path, params, dataset):
    """--max-queue at the HTTP layer: flooding returns 503 + Retry-After
    for the overflow, 200 for everything accepted."""
    from pmhc_tpu.cli.serve_cli import build_parser, create_server
    from pmhc_tpu.models.import_torch import export_torch_checkpoint

    model_path = str(tmp_path / "overload_model.pth")
    export_torch_checkpoint(params, model_path)
    args = build_parser().parse_args([
        model_path, "--port", "0", "--batch-size", "2", "-T", str(T),
        "--backend", "xla", "--max-wait-ms", "1", "--max-queue", "2",
    ])
    server = create_server(args)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address
    try:
        conn = http.client.HTTPConnection(host, port, timeout=300)
        conn.request("GET", "/healthz")
        assert json.loads(conn.getresponse().read())["max_queue"] == 2
        conn.close()

        entry = entry_from_dataset(dataset, dataset.entry_names[0])
        buf = io.BytesIO()
        np.savez(buf, **entry)
        body = buf.getvalue()

        statuses = []
        lock = threading.Lock()

        def client():
            c = http.client.HTTPConnection(host, port, timeout=300)
            c.request("POST", "/sample", body)
            r = c.getresponse()
            data = r.read()
            with lock:
                statuses.append((r.status, r.getheader("Retry-After")))
            if r.status == 200:
                _check_pdb(data)
            c.close()

        threads = [threading.Thread(target=client) for _ in range(24)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        codes = [s for s, _ in statuses]
        assert set(codes) <= {200, 503} and 200 in codes
        for status, retry in statuses:
            if status == 503:
                assert retry == "1"
    finally:
        server.shutdown()
        thread.join(timeout=30)
        server.batcher.close()
        server.server_close()
