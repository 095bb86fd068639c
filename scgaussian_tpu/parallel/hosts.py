"""Multi-host runtime initialization (SURVEY.md 5.8).

The reference has no distributed backend at all; here multi-host execution
is the standard JAX recipe: `jax.distributed.initialize` (coordinator
address via env or args), then the SAME SPMD programs (parallel/dp.py,
parallel/tiles.py) run over the global mesh — XLA routes collectives over
ICI within a slice and DCN across hosts. No NCCL-analog code exists or is
needed."""

from __future__ import annotations

import os
from typing import Optional

import jax
from jax.sharding import Mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the jax.distributed runtime. On single-host runs this is a
    no-op. Arguments default to the standard JAX_* / cluster env detection."""
    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over all global devices (all hosts)."""
    devs = jax.devices()
    return Mesh(jax.make_mesh((len(devs),), (axis,), devices=devs).devices, (axis,))


def is_primary() -> bool:
    return jax.process_index() == 0
