"""Smoke for tools/rmsd_parity.py (the BASELINE.md sampled-RMSD target):
both samplers run end-to-end on a tiny problem and the tool completes
with a verdict. The rtol here is deliberately loose (the real
measurement, T=200 x 16 entries, reports a 2.2% gap — docs/parity.md);
this guards the tool's plumbing through both data pipelines."""

import pytest

pytest.importorskip("torch")


def test_rmsd_parity_tool_runs(capsys):
    from tools.rmsd_parity import main

    main(["-T", "4", "--entries", "4", "--rtol", "5.0"])
    out = capsys.readouterr().out
    assert '"impl": "pmhc_tpu"' in out
    assert '"impl": "reference"' in out
    assert '"verdict": "MATCH"' in out
