"""Multi-host (DCN) initialisation — one global mesh across hosts.

The reference is single-host only (Colab TPU-v2-8 pmap, SURVEY.md §5.8).
Here multi-host falls out of the same mesh code: call
``initialize_multihost()`` once per process before building a pipeline and
the ``data`` axis spans every chip of every host; XLA routes the collectives
over ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax

from .mesh import make_mesh

logger = logging.getLogger("sdv_tpu")


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         model: int = 1):
    """``jax.distributed.initialize`` + a global (data, model) mesh.

    With no arguments, autodetects from the TPU environment variables (the
    normal GKE/TPU-VM path).  Returns the global mesh over
    ``jax.devices()`` (all hosts).
    """
    # NOTE: nothing may touch the backend (jax.devices/process_count/any
    # computation) before jax.distributed.initialize — checking
    # jax.process_count() first silently breaks every explicit-coordinator
    # init (caught by tests/test_multihost.py)
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    else:
        try:
            jax.distributed.initialize()  # TPU-env autodetection
        except Exception as e:  # single-process/dev environment
            logger.info("jax.distributed.initialize skipped: %s", e)
    logger.info("process %d/%d, %d local + %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())
    return make_mesh(model=model)
