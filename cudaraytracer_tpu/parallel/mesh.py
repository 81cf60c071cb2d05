"""Device-mesh helpers for multi-chip rendering/training.

The reference is strictly single-GPU (no NCCL/MPI/streams — SURVEY.md §5);
multi-chip is net-new here.  The canonical layout is a 2D mesh:

  axis 'dp' — data parallel over rays/pixels (image tiles): each chip renders
              its slice of the pixel set; the framebuffer is gathered at the
              end (replacing the cudaMemcpy D2H at render.h:226).
  axis 'tp' — "tensor parallel" over PRIMITIVES: each chip intersects its
              shard of the scene's primitive tables and the closest hit is
              combined with a min-reduction over ICI (the scene analog of
              sharding a weight matrix).

Scene tables, camera, and material/texture tables are replicated (small);
geometry is sharded along 'tp' when tp > 1.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host initialization (net-new vs the single-GPU reference).

    Call once per host before any jax op; arguments default to cluster
    auto-detection (GKE/TPU-VM env).  Returns the process index.  After this,
    ``make_mesh(len(jax.devices()), ...)`` spans the whole slice: 'dp'/'tp'
    collectives ride ICI within a slice and DCN across hosts via standard
    XLA collectives.
    """
    import jax
    if num_processes is not None and num_processes > 1 or coordinator:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index()


def make_mesh(n_devices: Optional[int] = None, tp: int = 1,
              devices=None) -> Mesh:
    """Build a ('dp', 'tp') mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    assert n_devices % tp == 0, f"{n_devices} devices not divisible by tp={tp}"
    dp = n_devices // tp
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0,
                    fill=None) -> np.ndarray:
    """Pad axis to a multiple (shard-divisibility); pads replicate row 0
    unless `fill` given."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad_shape = list(x.shape)
    pad_shape[axis] = rem
    if fill is None:
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(0, 1)
        pad = np.broadcast_to(np.asarray(x[tuple(idx)]), pad_shape)
    else:
        pad = np.full(pad_shape, fill, dtype=x.dtype)
    return np.concatenate([np.asarray(x), pad], axis=axis)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def dp_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = "dp"
    return NamedSharding(mesh, P(*spec))


def tp_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = "tp"
    return NamedSharding(mesh, P(*spec))
