"""Streaming receiver chain: stateful chunked RX over the jitted pipeline.

TPU-native equivalent of the reference's receiver_chain runtime
(src/receiver_chain.cpp:29-126): `process_samples(chunk)` accepts
arbitrary-length sample runs and returns every CRC-valid payload whose
frame completed. Where the reference threads six stateful blocks with
semaphores and per-stage carryover buffers, this chain keeps ONE piece of
host state — a native overlap-save chunker (csrc/stream_runtime.cpp) that
re-presents a forward halo so any frame starting inside an owned chunk is
whole inside that chunk's window — and runs the whole detect+decode
pipeline as jitted device calls on fixed window shapes.

Two device passes per window (the reference's frame_decoder does the same
two-phase header-then-payload walk, src/frame_decoder.cpp:45-91):
  1. detection + SIGNAL header decode on the owned region (rate-independent);
  2. one batched payload decode per distinct rate seen, with per-frame
     lengths from the headers (models/rx.decode_frame_dynamic_p).

Frames are delivered exactly once: a frame belongs to the window whose
owned [0, stride) region contains its preamble start.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..config import ChainParams, DEFAULT_PARAMS
from ..rates import ALL_RATES, Rate, from_rate_field, params_for
from . import native

#: detection + SIGNAL header need this much beyond a frame start
#: (320 preamble + 80 SIGNAL + LTS search margin)
DETECT_LEAD = 512

#: reference MAX_FRAME_SIZE (src/ppdu.h:17)
MAX_FRAME_SIZE = 2000


@dataclass(frozen=True)
class DecodedPacket:
    """One CRC-valid decoded frame (the chain's output unit)."""

    payload: bytes
    rate: Rate
    length: int
    #: preamble start position in the global sample stream
    start: int

    def __bytes__(self) -> bytes:
        return self.payload


class ReceiverChain:
    """Stateful streaming receiver (reference receiver_chain equivalent).

    Args:
      rates: rates to decode (default: all 11). The halo (and so the
        window shape / memory) is sized by the longest frame any of these
        rates can produce at max_length.
      max_length: largest payload length to decode (reference
        MAX_FRAME_SIZE, src/ppdu.h:17, is 2000; examples use 1500).
      params: chain thresholds + chunk size (ChainParams).
      cfo_correct: enable the native-mode CFO estimation/correction
        (the reference's is dead code; see models/rx.estimate_cfo_p).

    process_samples() accepts any-length complex or planar chunks, exactly
    like receiver_chain::process_samples (src/receiver_chain.cpp:106).
    """

    def __init__(self, rates: tuple[Rate, ...] = ALL_RATES,
                 max_length: int = 1500,
                 params: ChainParams = DEFAULT_PARAMS,
                 cfo_correct: bool = False):
        if max_length > MAX_FRAME_SIZE:
            raise ValueError(f"max_length > MAX_FRAME_SIZE ({MAX_FRAME_SIZE})")
        self.rates = tuple(Rate(r) for r in rates)
        self.max_length = int(max_length)
        self.params = params
        self.cfo_correct = bool(cfo_correct)
        self.stride = params.chunk_size
        halo = max(params_for(r).frame_samples(max_length)
                   for r in self.rates)
        self.window = self.stride + max(halo, DETECT_LEAD)
        self._chunker = native.Chunker(self.stride, self.window)
        self._valid_fields = {params_for(r).rate_field: r for r in self.rates}
        self._jit_cache: dict = {}

    # --- jitted device functions (built lazily, cached per chain) --------

    def _headers_fn(self):
        import jax
        from ..models import frontend

        key = "headers"
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(functools.partial(
                frontend.decode_headers_p,
                max_frames=self.params.max_frames_per_chunk,
                params=self.params))
        return self._jit_cache[key]

    def _decode_fn(self, rate: Rate):
        import jax
        import jax.numpy as jnp
        from ..models import rx

        key = ("decode", rate)
        if key not in self._jit_cache:
            def fn(stream, starts):
                return jax.vmap(
                    lambda s: rx.decode_frame_dynamic_p(
                        stream, rate, self.max_length, start=s,
                        cfo_correct=self.cfo_correct))(starts)
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    # --- streaming API ----------------------------------------------------

    def process_samples(self, samples) -> list[DecodedPacket]:
        """Feed a chunk of samples; return packets completed by it.

        samples: 1-D complex array, or planar (re, im) float arrays.
        """
        self._chunker.push(samples)
        packets: list[DecodedPacket] = []
        while self._chunker.ready():
            packets.extend(self._process_window(self._chunker.pop()))
        return packets

    def flush(self) -> list[DecodedPacket]:
        """Drain buffered samples (zero-padding the tail) at stream end."""
        packets: list[DecodedPacket] = []
        while True:
            out = self._chunker.pop(pad=True)
            if out is None:
                return packets
            packets.extend(self._process_window(out))

    def _process_window(self, window) -> list[DecodedPacket]:
        import jax.numpy as jnp

        w_re, w_im, gpos = window
        detect = (jnp.asarray(w_re[: self.stride + DETECT_LEAD]),
                  jnp.asarray(w_im[: self.stride + DETECT_LEAD]))
        hdr = self._headers_fn()(detect)
        starts = np.asarray(hdr["starts"])
        owned = (np.asarray(hdr["header_ok"])
                 & (starts >= 0) & (starts < self.stride))
        if not owned.any():
            return []

        stream_dev = (jnp.asarray(w_re), jnp.asarray(w_im))
        fields = np.asarray(hdr["rate_field"])
        lengths = np.asarray(hdr["hdr_length"])
        packets: list[DecodedPacket] = []
        for field in np.unique(fields[owned]):
            rate = self._valid_fields.get(int(field))
            if rate is None:  # valid-parity header at an unconfigured rate
                continue
            sel = owned & (fields == field) & (lengths <= self.max_length)
            if not sel.any():
                continue
            idx = np.nonzero(sel)[0]
            out = self._decode_fn(rate)(
                stream_dev, jnp.asarray(starts[idx], jnp.int32))
            crc_ok = np.asarray(out["crc_ok"])
            payloads = np.asarray(out["payload"], dtype=np.uint8)
            hdr_len = np.asarray(out["hdr_length"])
            for k in range(idx.size):
                if not crc_ok[k]:
                    continue  # reference: drop, keep streaming (ppdu.cpp:274)
                n = int(hdr_len[k])
                packets.append(DecodedPacket(
                    payload=payloads[k, :n].tobytes(),
                    rate=rate, length=n,
                    start=gpos + int(starts[idx[k]])))
        packets.sort(key=lambda p: p.start)
        return packets
