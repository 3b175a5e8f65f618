"""Score networks (denoisers) as pure functions over parameter pytrees."""

from pmhc_tpu.models.score import ScoreNetworkConfig, init_score_network, score_network_forward
from pmhc_tpu.models.import_torch import import_torch_checkpoint

__all__ = [
    "ScoreNetworkConfig",
    "init_score_network",
    "score_network_forward",
    "import_torch_checkpoint",
]
