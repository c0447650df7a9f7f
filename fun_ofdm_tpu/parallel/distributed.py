"""Multi-host initialization and global-mesh construction.

The reference runs on one host (its only interconnect is GbE to the USRP,
reference src/usrp.cpp:103,129). The TPU deployment target is a multi-host
pod slice: each host process drives its local chips, `jax.distributed`
links the processes, and one global (channel, time) Mesh spans every chip
with XLA collectives riding ICI (and DCN between hosts).

Typical launch (same program on every host):

    from fun_ofdm_tpu.parallel import distributed
    distributed.initialize()            # env-driven on TPU pods
    mesh = distributed.global_mesh()    # all processes' devices
    streams = distributed.shard_host_capture(mesh, local_re, local_im)
    out = stream_shard.sharded_receive(streams, rate, length, mesh, ...)

On CPU test rigs, pass coordinator_address/num_processes/process_id
explicitly (see tests/test_multihost.py for the 2-process x 4-device
harness).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Bring up the JAX distributed runtime (idempotent).

    On TPU pods all arguments come from the environment and this is just
    `jax.distributed.initialize()`. On CPU/GPU rigs pass them explicitly.
    Safe to call when already initialized (no-op) or single-process with
    no coordinator configured (also a no-op).

    Must run before anything touches the XLA backend (jax.devices(),
    any computation) — same contract as jax.distributed.initialize.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids)
    except (RuntimeError, ValueError) as e:
        msg = str(e).lower()
        if "already" in msg:
            return
        # Only treat "no distributed environment configured" as the
        # single-process case. Any OTHER failure (bad coordinator env,
        # network error) must raise: silently degrading to single-process
        # would make global_mesh() span only local devices and a pod run
        # would process a fraction of the data or hang in collectives
        # (ADVICE r2 medium).
        if (coordinator_address is None and num_processes is None
                and ("environment" in msg or "coordinator" in msg
                     or "not set" in msg or "unable to detect" in msg)):
            import logging
            logging.getLogger(__name__).info(
                "jax.distributed not configured (%s); "
                "running single-process", e)
            return
        raise


def global_mesh(channel: int | None = None,
                time: int | None = None) -> Mesh:
    """A (channel, time) mesh over every device of every process.

    Device order is jax.devices() (process-major on pods), so with the
    default channel-major split each host's chips land in contiguous mesh
    rows and the time-axis ppermute halo exchange stays on ICI wherever
    the time axis fits inside one host.
    """
    return make_mesh(jax.devices(), channel=channel, time=time)


def shard_host_capture(mesh: Mesh, local_re: np.ndarray,
                       local_im: np.ndarray):
    """Assemble the global (channel, time)-sharded capture from per-host
    local sample blocks.

    Each process passes the (C_local, N_local) slab it ingested (its own
    radios / file shards); the result is one logical (C_global, N_global)
    planar array pair sharded P('channel', 'time') with zero cross-host
    copies (make_array_from_process_local_data wraps the local buffers).
    """
    sharding = NamedSharding(mesh, P("channel", "time"))
    re = jax.make_array_from_process_local_data(sharding, local_re)
    im = jax.make_array_from_process_local_data(sharding, local_im)
    return re, im


def local_capture_shape(mesh: Mesh, channels_global: int,
                        n_global: int) -> tuple[int, int]:
    """The (C_local, N_local) slab this process must supply to
    shard_host_capture for a (channels_global, n_global) capture."""
    n_chan, n_time = mesh.devices.shape
    if channels_global % n_chan or n_global % n_time:
        raise ValueError(
            f"capture shape ({channels_global}, {n_global}) must divide "
            f"the ({n_chan}, {n_time}) (channel, time) mesh evenly; pad "
            f"the capture (ADVICE r2: silent misdivision corrupts slabs)")
    # per-process device grid: which mesh coordinates are local
    local = np.asarray([[d.process_index == jax.process_index()
                         for d in row] for row in mesh.devices])
    chan_rows = local.any(axis=1).sum()
    time_cols = local.any(axis=0).sum()
    return (channels_global // n_chan * chan_rows,
            n_global // n_time * time_cols)
