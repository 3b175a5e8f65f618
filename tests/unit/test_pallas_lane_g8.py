"""geom8 fused EGNN kernel (pmhc_tpu/ops/egnn_pallas_lane_g8.py):
interpret-mode parity with the dense XLA layer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmhc_tpu.data import synthetic_batch
from pmhc_tpu.models import ScoreNetworkConfig, init_score_network
from pmhc_tpu.models.egnn import egnn_forward
from pmhc_tpu.models.score import relpos_edge_pre
from pmhc_tpu.ops.egnn_pallas_lane_g8 import egnn_forward_pallas_lane_g8
from pmhc_tpu.train.trainer import prepare_batch

CONFIG = ScoreNetworkConfig()


def _layer_inputs(batch_size=4, seed=9):
    batch = prepare_batch(synthetic_batch(batch_size=batch_size, seed=seed))
    params = init_score_network(jax.random.key(0), CONFIG)["gnn1"]
    B, N = batch["mask"].shape
    Pk = batch["pocket_mask"].shape[-1]
    h = jnp.concatenate(
        (batch["features"], jnp.full((B, N, 1), 0.5, jnp.float32)), axis=-1
    )
    pocket_h = jnp.concatenate(
        (batch["pocket_features"], jnp.zeros((B, Pk, 1), jnp.float32)), axis=-1
    )
    edge_pre = relpos_edge_pre(params, CONFIG.max_len)
    return params, (
        batch["frames"], batch["torsions"], h, edge_pre,
        batch["mask"].astype(jnp.float32), pocket_h, batch["pocket_frames"],
        batch["pocket_mask"].astype(jnp.float32),
    )


@pytest.mark.parametrize(
    "batch_size,lane_block",
    # 300 > CHUNK=256 exercises the batch-grid path (ragged final chunk)
    [(4, 128), (9, 128), (8, 1024), (300, 1024)],
)
def test_g8_kernel_matches_dense(batch_size, lane_block):
    params, args = _layer_inputs(batch_size=batch_size)
    dense_f, dense_t, dense_h = egnn_forward(params, *args)
    g8_f, g8_t, g8_h = egnn_forward_pallas_lane_g8(
        params, *args, lane_block=lane_block, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(g8_f.quats), np.asarray(dense_f.quats), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(g8_f.trans), np.asarray(dense_f.trans), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(g8_t), np.asarray(dense_t), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(g8_h), np.asarray(dense_h), atol=2e-4)


def test_g8_kernel_fully_masked_row():
    params, args = _layer_inputs(batch_size=4)
    (frames, torsions, h, edge_pre, mask, pocket_h, pk_frames, pk_mask) = args
    mask = mask.at[1].set(0.0)
    pk_mask = pk_mask.at[1].set(0.0)
    args = (frames, torsions, h, edge_pre, mask, pocket_h, pk_frames, pk_mask)
    dense_f, dense_t, dense_h = egnn_forward(params, *args)
    g8_f, g8_t, g8_h = egnn_forward_pallas_lane_g8(
        params, *args, lane_block=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(g8_f.quats), np.asarray(dense_f.quats), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(g8_f.trans), np.asarray(dense_f.trans), atol=2e-4)


def test_g8_kernel_bf16_close_to_f32():
    """bf16 MXU mode tracks f32 at bf16-rounding scale (same tolerance
    rationale as the lane kernel's bf16 test); unit quats exactly."""
    params, args = _layer_inputs(batch_size=4)
    f32_f, f32_t, f32_h = egnn_forward_pallas_lane_g8(
        params, *args, lane_block=128, interpret=True)
    b_f, b_t, b_h = egnn_forward_pallas_lane_g8(
        params, *args, lane_block=128, interpret=True, bf16=True)
    np.testing.assert_allclose(
        np.asarray(b_f.quats), np.asarray(f32_f.quats), atol=5e-2)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(b_f.quats), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(b_f.trans), np.asarray(f32_f.trans), atol=0.5)
    np.testing.assert_allclose(np.asarray(b_t), np.asarray(f32_t), atol=0.1)
    np.testing.assert_allclose(np.asarray(b_h), np.asarray(f32_h), atol=0.5)


def test_pack_headmm_ext_layout():
    """whm_ext @ [hid; local; -d2; qdot^2; 1; tors] must equal the
    separate-stage pre_heads computation, row block by row block."""
    import numpy as np

    from pmhc_tpu.models import ScoreNetworkConfig, init_score_network
    from pmhc_tpu.ops.egnn_pallas_lane import pack_lane_weights
    from pmhc_tpu.ops.egnn_pallas_lane_g8 import pack_headmm_ext

    params = init_score_network(jax.random.key(5), ScoreNetworkConfig())
    weights = pack_lane_weights(params["gnn1"], 23, 96)
    (wmi, bm1, whm, wad, waq, ba1, w2all, b2all, wfh, wfm2, bf1,
     wf2, bf2, bl1, wrq, br1, wtt, bt1) = [np.asarray(w) for w in weights]
    wext = np.asarray(pack_headmm_ext(weights))
    T = whm.shape[0] // 4
    assert wext.shape == (4 * T, whm.shape[1] + 21)

    rng = np.random.default_rng(0)
    L = 8
    hid = rng.normal(size=(whm.shape[1], L)).astype(np.float32)
    local = rng.normal(size=(4, L)).astype(np.float32)
    d2 = rng.uniform(1, 50, size=(1, L)).astype(np.float32)
    qdot = rng.normal(size=(1, L)).astype(np.float32)
    tors = rng.normal(size=(14, L)).astype(np.float32)

    ext = np.concatenate(
        (hid, local, -d2, qdot**2, np.ones((1, L), np.float32), tors))
    got = wext @ ext

    heads = whm @ hid
    expect = heads + np.concatenate((
        wad * (-d2) + waq * qdot**2 + ba1,
        wrq @ local + br1,
        wtt @ tors + bt1,
        np.broadcast_to(bl1, (T, L)),
    ))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_g8_kernel_headpack_off_matches_dense_and_on(monkeypatch):
    """PMHC_G8_HEADPACK=0 restores the separate-stage kernel (the
    stage-ablation tooling's path, egnn_pallas_lane_g8.py) — it must
    stay dense-parity AND match the default headpack kernel to f32
    reassociation tolerance, so the env-var fallback cannot silently
    rot (VERDICT r4 next #4 / ADVICE r4)."""
    params, args = _layer_inputs(batch_size=4)
    dense_f, dense_t, dense_h = egnn_forward(params, *args)
    on_f, on_t, on_h = egnn_forward_pallas_lane_g8(
        params, *args, lane_block=128, interpret=True)
    monkeypatch.setenv("PMHC_G8_HEADPACK", "0")
    off_f, off_t, off_h = egnn_forward_pallas_lane_g8(
        params, *args, lane_block=128, interpret=True)
    for got, want, tol in (
        (off_f.quats, dense_f.quats, 5e-5),
        (off_f.trans, dense_f.trans, 2e-4),
        (off_t, dense_t, 2e-4),
        (off_h, dense_h, 2e-4),
        # headpack is a reassociation of the same f32 math
        (off_f.quats, on_f.quats, 1e-5),
        (off_f.trans, on_f.trans, 5e-5),
        (off_t, on_t, 5e-5),
        (off_h, on_h, 5e-5),
    ):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=tol)
