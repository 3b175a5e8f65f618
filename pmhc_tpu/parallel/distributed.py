"""Multi-host initialization.

The reference is single-process/single-device (SURVEY.md §2.3). On a TPU
pod (or multi-slice), each host process calls ``initialize_multihost()``
once before any jax use; after it, ``jax.devices()`` spans the whole pod,
the same ``Mesh(('data','model'))`` code paths shard globally, and the
GSPMD collectives ride ICI within a slice and DCN across slices with no
code changes. The data loader shards entries per host via
``PrefetchLoader(process_index=jax.process_index(),
process_count=jax.process_count())``.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` with TPU auto-detection defaults.

    On Cloud TPU, all arguments are discovered from the metadata service;
    pass them explicitly for other fabrics.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def loader_shard_args() -> dict:
    """kwargs for PrefetchLoader giving this host its entry shard."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
    }
