"""Multi-host process-group initialization.

The reference has no distributed code at all (SURVEY.md §2-bis / §5.8);
this is TPU-native scope. On a multi-host pod slice each host runs one
process, ``jax.distributed.initialize`` wires them into one JAX runtime
(global ``jax.devices()`` spanning all hosts), and the existing mesh /
shard_map training steps work unchanged — collectives ride ICI within a
slice and DCN across slices.

Launch recipe (one command per host):

    EGS_TPU_COORDINATOR=<host0-ip>:8476 \
    EGS_TPU_NUM_PROCESSES=<n_hosts> \
    EGS_TPU_PROCESS_ID=<this-host-index> \
    python train.py -c configs/tandt_db.yaml -d <data> [--mesh gauss:8,tiles:4]

On Cloud TPU VMs the three variables can be omitted entirely —
``jax.distributed.initialize()`` autodetects the slice topology — set
just ``EGS_TPU_DISTRIBUTED=1`` there. The same machinery is exercised on
CPUs in ``tests/test_multiprocess.py`` (two processes x N virtual
devices, collectives crossing the process boundary).
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_INITIALIZED = False


def maybe_initialize_from_env() -> bool:
    """Initialize the multi-process runtime if the environment asks for it
    (EGS_TPU_COORDINATOR=host:port or EGS_TPU_DISTRIBUTED=1 for
    autodetection). Must run before any backend is touched. Returns True
    when a multi-process group was initialized."""
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coordinator = os.environ.get("EGS_TPU_COORDINATOR", "")
    auto = os.environ.get("EGS_TPU_DISTRIBUTED", "") == "1"
    if not coordinator and not auto:
        return False

    import jax

    if coordinator:
        num_processes = int(os.environ["EGS_TPU_NUM_PROCESSES"])
        process_id = int(os.environ["EGS_TPU_PROCESS_ID"])
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        jax.distributed.initialize()  # Cloud TPU autodetection
    _INITIALIZED = True
    logger.info(
        f"distributed runtime up: process {jax.process_index()}/"
        f"{jax.process_count()}, {jax.local_device_count()} local / "
        f"{jax.device_count()} global devices"
    )
    return True
