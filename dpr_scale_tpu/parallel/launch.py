"""Multi-host initialization (the SLURM/submitit launcher's role,
reference conf/trainer/slurm.yaml — SURVEY.md §2.9 process launch).

On TPU pods, `jax.distributed.initialize()` autodetects everything from
the TPU metadata. Elsewhere (CPU simulation, GPU, custom clusters) the
coordinator and process ids come from env vars:

    DPR_COORDINATOR=host:port DPR_NUM_PROCESSES=4 DPR_PROCESS_ID=0 \
        python -m dpr_scale_tpu.cli.train ...

Call :func:`maybe_initialize_distributed` before building the mesh; with
no env configured (single host) it is a no-op. On SLURM, map the usual
variables: DPR_PROCESS_ID=$SLURM_PROCID, DPR_NUM_PROCESSES=$SLURM_NTASKS,
DPR_COORDINATOR=$SLURM_JOB_NODELIST_HEAD:port (submitit's max_num_timeout
requeue behavior is replaced by `--resume` + orbax last-checkpoints).
"""
from __future__ import annotations

import os
from typing import Optional


def maybe_initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when configured; returns True if done."""
    import jax

    coordinator = coordinator or os.environ.get("DPR_COORDINATOR")
    num_processes = num_processes or _int_env("DPR_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("DPR_PROCESS_ID")

    hostnames = [
        h
        for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")
        if h.strip()
    ]
    if coordinator is None and len(hostnames) > 1:
        # TPU pod: metadata-based autodetection. A failure here must NOT
        # fall through to single-host mode — every host would then train
        # the full data independently with the same seed (wrong global
        # batch, checkpoint-dir collisions) and nothing would ever error.
        # (A single-entry TPU_WORKER_HOSTNAMES — e.g. "localhost" from a
        # single-chip runtime — IS a deliberate single-host run.)
        try:
            jax.distributed.initialize()
            return True
        except (RuntimeError, ValueError) as e:
            raise RuntimeError(
                f"TPU_WORKER_HOSTNAMES lists {len(hostnames)} hosts "
                "(multi-host pod) but jax.distributed.initialize() failed "
                "— refusing to fall back to independent single-host "
                "training. Fix the coordinator/metadata or unset "
                f"TPU_WORKER_HOSTNAMES for a single-host run. Cause: {e}"
            ) from e
    if coordinator is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _int_env(name: str) -> Optional[int]:
    val = os.environ.get(name)
    return int(val) if val is not None else None
