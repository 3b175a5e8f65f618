"""End-to-end training-dynamics parity vs the torch reference (10 steps,
identical weights/data/timesteps/noise) — the BASELINE.md loss-curve gate.

The tolerance (5%) absorbs the documented quaternion-sign deviation
(docs/parity.md): present from step 0, not growing with steps.
"""

import pytest

pytest.importorskip("torch")


def test_loss_curves_track():
    from tools.loss_curve_parity import main

    with pytest.raises(SystemExit) as excinfo:
        main(["--steps", "10", "--batch-size", "4"])
    assert excinfo.value.code == 0
