"""Sharded overlap-save streaming RX over a (channel, time) mesh.

Each device holds a (channels_local, block) slice of the global capture
(planar re/im). Frames whose preamble starts inside a device's block may
extend into the next time block, so every device pulls a `halo` of samples
from its right time-neighbor with one `ppermute` (the reference achieves
the same effect single-threaded with its 160-sample carryover buffers,
src/timing_sync.cpp:134-137 - here the halo must cover a whole frame since
the owning device decodes it locally).

Ownership rule: a device delivers exactly the frames whose detected start
lies inside its own block (not in the halo), so every frame is delivered
once no matter how blocks are cut.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import ChainParams, DEFAULT_PARAMS
from ..models import frontend
from ..ops.cplx import CArr
from ..rates import Rate, params_for


def _halo_exchange_right(block: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Append the first `halo` samples of the right time-neighbor.

    block: (..., n_local). The last block in the time axis gets zeros
    (non-ring ppermute: missing partners produce zeros).
    """
    nt = jax.lax.axis_size(axis_name)
    head = block[..., :halo]
    # send my head to my left neighbor (i -> i-1); last block receives none
    perm = [(i, i - 1) for i in range(1, nt)]
    recv = jax.lax.ppermute(head, axis_name, perm)
    return jnp.concatenate([block, recv], axis=-1)


def sharded_receive(streams: CArr, rate: Rate, length: int,
                    mesh: Mesh, max_frames_per_block: int,
                    params: ChainParams = DEFAULT_PARAMS):
    """Detect+decode frames across a (channel, time)-sharded capture.

    streams: planar (re, im), each (C, N), shardable as P('channel','time').
    Returns per-block slot dicts gathered to
    (C, num_time_blocks*max_frames_per_block, ...) with `valid`/`crc_ok`
    masks; `starts` are positions in the *global* capture.
    """
    frame_len = params_for(rate).frame_samples(length)
    # halo: a frame starting at the last owned sample needs frame_len - 1
    # further samples; detection also needs the 96-sample LTS search + 63
    halo = frame_len + params.lts_search + 64

    def local_fn(re, im):  # each (C_loc, n_local)
        n_local = re.shape[-1]
        t_idx = jax.lax.axis_index("time")
        ext = (_halo_exchange_right(re, halo, "time"),
               _halo_exchange_right(im, halo, "time"))
        out = jax.vmap(
            lambda r, i: frontend.receive_capture_p(
                (r, i), rate, length, max_frames_per_block, params)
        )(ext[0], ext[1])
        owned = out["starts"] < n_local  # ownership: starts in my block
        global_starts = jnp.where(
            owned, out["starts"] + t_idx * n_local, -1).astype(jnp.int32)
        return {
            "starts": global_starts,
            "valid": out["valid"] & owned,
            "crc_ok": out["crc_ok"] & owned,
            "header_ok": out["header_ok"] & owned,
            "payload": out["payload"],
        }

    specs_out = {
        "starts": P("channel", "time"),
        "valid": P("channel", "time"),
        "crc_ok": P("channel", "time"),
        "header_ok": P("channel", "time"),
        "payload": P("channel", "time", None),
    }
    # check_vma=False: the codec ops initialize scan carries from
    # replicated constants (Viterbi metrics, CRC state); they are
    # mesh-agnostic and must not be annotated with mesh axes.
    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("channel", "time"), P("channel", "time")),
        out_specs=specs_out,
        check_vma=False,
    )
    return fn(streams[0], streams[1])


def sharded_receive_dynamic(streams: CArr, rates: tuple[Rate, ...],
                            max_length: int, mesh: Mesh,
                            max_frames_per_block: int,
                            params: ChainParams = DEFAULT_PARAMS):
    """Any-rate, header-driven detect+decode across a sharded capture.

    The multi-chip equivalent of the reference's zero-configuration
    receive (src/frame_decoder.cpp:72-88): each device detects frames in
    its own time block, reads every frame's (rate, length) from its
    SIGNAL header, and decodes it through the universal any-rate decoder
    (models/frontend.receive_capture_anyrate_p) — same ownership rule and
    right-neighbor halo `ppermute` as sharded_receive, with the halo
    sized for the slowest configured rate at max_length (a frame of any
    rate straddling a time cut is decoded whole by its owning device).

    streams: planar (re, im), each (C, N), shardable P('channel','time').
    Returns per-slot dicts gathered to
    (C, num_time_blocks*max_frames_per_block, ...) with global `starts`;
    `rate_field`/`hdr_length` report each frame's header values.
    """
    rates = tuple(rates)
    frame_len_max = max(params_for(r).frame_samples(max_length)
                        for r in rates)
    halo = frame_len_max + params.lts_search + 64

    def local_fn(re, im):  # each (C_loc, n_local)
        n_local = re.shape[-1]
        t_idx = jax.lax.axis_index("time")
        ext = (_halo_exchange_right(re, halo, "time"),
               _halo_exchange_right(im, halo, "time"))
        out = jax.vmap(
            lambda r, i: frontend.receive_capture_anyrate_p(
                (r, i), rates, max_length, max_frames_per_block, params)
        )(ext[0], ext[1])
        owned = out["starts"] < n_local  # ownership: starts in my block
        global_starts = jnp.where(
            owned, out["starts"] + t_idx * n_local, -1).astype(jnp.int32)
        return {
            "starts": global_starts,
            "valid": out["valid"] & owned,
            "crc_ok": out["crc_ok"] & owned,
            "header_ok": out["header_ok"] & owned,
            "rate_field": out["rate_field"],
            "hdr_length": out["hdr_length"],
            "payload": out["payload"],
            # per-(channel, time-block) count of detection events lost to
            # the blocked extractor's per-block cap (ADVICE r4: surfaced
            # so dense-noise captures aren't silently lossy)
            "detect_dropped": out["detect_dropped"][:, None],
        }

    specs_out = {
        "starts": P("channel", "time"),
        "valid": P("channel", "time"),
        "crc_ok": P("channel", "time"),
        "header_ok": P("channel", "time"),
        "rate_field": P("channel", "time"),
        "hdr_length": P("channel", "time"),
        "payload": P("channel", "time", None),
        "detect_dropped": P("channel", "time"),
    }
    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("channel", "time"), P("channel", "time")),
        out_specs=specs_out,
        check_vma=False,
    )
    return fn(streams[0], streams[1])


@functools.lru_cache(maxsize=None)
def sharded_receive_jit(rate: Rate, length: int, mesh: Mesh,
                        max_frames_per_block: int,
                        params: ChainParams = DEFAULT_PARAMS):
    return jax.jit(functools.partial(
        sharded_receive, rate=rate, length=length, mesh=mesh,
        max_frames_per_block=max_frames_per_block, params=params))


@functools.lru_cache(maxsize=None)
def sharded_receive_dynamic_jit(rates: tuple[Rate, ...], max_length: int,
                                mesh: Mesh, max_frames_per_block: int,
                                params: ChainParams = DEFAULT_PARAMS):
    return jax.jit(functools.partial(
        sharded_receive_dynamic, rates=rates, max_length=max_length,
        mesh=mesh, max_frames_per_block=max_frames_per_block,
        params=params))
