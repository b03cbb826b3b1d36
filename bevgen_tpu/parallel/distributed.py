"""Multi-host initialization & rank-aware utilities.

TPU-native replacement for the reference's distributed plumbing:
`jax.distributed.initialize` + GSPMD instead of NCCL process groups
(SURVEY §5.8), `rank_zero` guards instead of PL's rank_zero_only
(utils/pylogger.py:13), per-host data sharding for input pipelines.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Initialize multi-host JAX when running on a multi-host topology.
    No-op on single-host (incl. this repo's 1-chip dev setup)."""
    if num_processes is None:
        num_processes = int(os.environ.get("BEVGEN_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator or os.environ["BEVGEN_COORDINATOR"],
        num_processes=num_processes,
        process_id=(process_id if process_id is not None
                    else int(os.environ["BEVGEN_PROCESS_ID"])))


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def rank_zero(fn):
    """Run only on process 0 (PL rank_zero_only equivalent)."""
    @functools.wraps(fn)
    def wrapped(*a, **k):
        if is_main_process():
            return fn(*a, **k)
        return None
    return wrapped


def host_shard_indices(n: int) -> slice:
    """This host's contiguous shard of an n-sample dataset (per-host
    input sharding for multi-host training).

    Every host gets exactly n // process_count samples — the remainder
    is DROPPED, not given to the last host: unequal shards would
    desynchronize the per-host input pipelines (one host sees an extra
    batch) and hang the SPMD collectives at end of epoch."""
    p, np_ = jax.process_index(), jax.process_count()
    per = n // np_
    return slice(p * per, (p + 1) * per)
