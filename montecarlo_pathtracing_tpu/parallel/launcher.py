"""Restartable multi-host launcher.

The reference is a single-process GL app with no failure handling beyond
shader-compile errors (SURVEY.md §5). For pod-scale renders the framework
provides: `jax.distributed` initialization from env/flags, a render loop
that checkpoints the accumulation state every K passes, and crash-resume —
a relaunched process picks up at the last checkpointed pass, so losing a
host costs at most K passes of work.

Launch (per host):
  python -m montecarlo_pathtracing_tpu render --distributed \\
      --coordinator host0:8476 --num-processes 4 --process-id $ID \\
      --checkpoint state.npz --checkpoint-every 64 ...

Determinism makes this safe: per-pixel seeds are pure functions of
(uv, pass), so re-rendering a partially-completed pass range after a
restart yields bit-identical contributions.
"""
from __future__ import annotations

import os

import jax


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """jax.distributed.initialize from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    Returns this process's id. Safe to call when already initialized."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return process_id


def run_distributed_render(renderer, spp: int, checkpoint: str | None,
                           checkpoint_every: int = 64,
                           is_coordinator: bool | None = None):
    """Progressive render with periodic checkpointing; resumes from
    `checkpoint` if present. Only the coordinator writes checkpoints and
    the final image (single-writer; the accumulator state is replicated
    or sharded identically on every host by construction)."""
    if is_coordinator is None:
        is_coordinator = jax.process_index() == 0
    if checkpoint and os.path.exists(checkpoint):
        renderer.load_checkpoint(checkpoint)
    while renderer.nb_passes < spp:
        target = min(spp, renderer.nb_passes + max(1, checkpoint_every))
        renderer.run(target)
        if checkpoint and is_coordinator:
            renderer.save_checkpoint(checkpoint)
    return renderer.image()
