"""Pallas TPU kernels for the hot compute paths."""

from pmhc_tpu.ops.egnn_pallas import egnn_forward_pallas, egnn_forward_pallas_trainable

__all__ = ["egnn_forward_pallas", "egnn_forward_pallas_trainable"]
