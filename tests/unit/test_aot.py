"""AOT sampler artifacts (pmhc_tpu.aot): export/load roundtrip, config
pinning, and bit-identical outputs vs the jitted service."""

import jax
import pytest

from pmhc_tpu.models import ScoreNetworkConfig, init_score_network
from pmhc_tpu.serve import SamplerService, dummy_entry

T = 5


@pytest.fixture(scope="module")
def params():
    cfg = ScoreNetworkConfig(noise_step_count=T, backend="xla")
    return init_score_network(jax.random.key(2), cfg)


def _service(params, **kw):
    kw.setdefault("batch_size", 2)
    kw.setdefault("noise_step_count", T)
    kw.setdefault("backend", "xla")
    return SamplerService(params, **kw)


@pytest.mark.parametrize("fmt", ["executable", "stablehlo"])
def test_aot_roundtrip_bit_identical(tmp_path, params, fmt):
    from pmhc_tpu.aot import load_sampler, save_sampler

    svc = _service(params)
    entries = [dummy_entry(), dummy_entry()]
    key = jax.random.key(9)
    jit_pdbs = svc.sample_entries(entries, key)

    path = str(tmp_path / "sampler.aot")
    save_sampler(svc, path, fmt=fmt)

    fresh = _service(params)
    run = load_sampler(path, fresh)
    assert fresh._run is run
    try:
        aot_pdbs = fresh.sample_entries(entries, key)
    except jax.errors.JaxRuntimeError as e:
        # Known XLA:CPU AOT-loader defect, seen intermittently mid-suite
        # only (passes in isolation): the deserialized CPU executable
        # loads with a machine-feature mismatch ("+prefer-no-scatter ...
        # not supported on the host machine") and then fails at run with
        # "Buffer Definition Event: Function <fusion> not found". The
        # executable format targets TPU serving, where the driver bench
        # (tools/bench_aot.py) validates the real roundtrip on chip.
        if fmt == "executable" and "Buffer Definition Event" in str(e):
            pytest.xfail(f"XLA:CPU AOT loader feature-mismatch defect: {e}")
        raise
    assert aot_pdbs == jit_pdbs  # same program -> identical bytes


def test_aot_executable_rejects_jax_version_drift(tmp_path, params):
    """The compiled-executable format is pinned to the exact jaxlib:
    a version-mismatched artifact must fail at LOAD with a clear
    message, not crash mid-request."""
    import json
    import struct

    from pmhc_tpu.aot import MAGIC_XC, load_sampler, save_sampler

    path = str(tmp_path / "sampler.aot")
    save_sampler(_service(params), path, fmt="executable")
    data = open(path, "rb").read()
    off = len(MAGIC_XC)
    (meta_len,) = struct.unpack_from("<I", data, off)
    meta = json.loads(data[off + 4:off + 4 + meta_len].decode())
    meta["jax_version"] = "0.0.1"
    doctored = json.dumps(meta).encode()
    with open(path, "wb") as f:
        f.write(MAGIC_XC + struct.pack("<I", len(doctored)) + doctored
                + data[off + 4 + meta_len:])
    with pytest.raises(ValueError, match="cannot load under"):
        load_sampler(path, _service(params))


def test_aot_config_mismatch_rejected(tmp_path, params):
    from pmhc_tpu.aot import load_sampler, save_sampler

    path = str(tmp_path / "sampler.aot")
    save_sampler(_service(params), path)
    other = _service(params, batch_size=3)
    with pytest.raises(ValueError, match="batch_size"):
        load_sampler(path, other)
    strided = _service(params, num_steps=2)
    with pytest.raises(ValueError, match="num_steps"):
        load_sampler(path, strided)


def test_aot_bad_file_rejected(tmp_path, params):
    from pmhc_tpu.aot import load_sampler

    path = tmp_path / "junk.aot"
    path.write_bytes(b"definitely not an artifact")
    with pytest.raises(ValueError, match="not a pmhc AOT artifact"):
        load_sampler(str(path))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="TPU-lowered AOT artifact needs the real chip "
                           "(the suite pins the CPU backend; run via "
                           "tools/bench_aot.py on hardware)")
def test_aot_roundtrip_on_tpu(tmp_path, params):
    """The deployment story on actual TPU: export the TPU-lowered
    artifact, reload, bit-identity vs the jitted path (driven on the
    chip by tools/bench_aot.py, which also measures startup savings in
    a FRESH process; this in-process test guards the lowering path)."""
    import numpy as np

    from pmhc_tpu.aot import load_sampler, save_sampler

    service = SamplerService(params, batch_size=2, noise_step_count=6,
                             backend="g8", bf16=True, seed=0)
    mb, key, _ = service.build_model_batch([dummy_entry()],
                                           jax.random.key(3))
    jit_out = service._run(mb, key)
    path = str(tmp_path / "sampler_tpu.aot")
    save_sampler(service, path)
    run = load_sampler(path, service)
    aot_out = run(mb, key)
    np.testing.assert_array_equal(
        np.asarray(jit_out["frames"].quats), np.asarray(aot_out["frames"].quats))
    np.testing.assert_array_equal(
        np.asarray(jit_out["torsions"]), np.asarray(aot_out["torsions"]))
