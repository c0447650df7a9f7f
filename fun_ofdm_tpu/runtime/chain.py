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
import sys
import time
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


@dataclass
class ChainStats:
    """Running counters for chain observability (the reference's only
    telemetry is stderr prints, src/ppdu.cpp:276; these are the structured
    equivalent)."""

    samples_in: int = 0
    windows: int = 0
    headers_ok: int = 0
    crc_ok: int = 0
    crc_fail: int = 0
    unknown_rate: int = 0
    #: CRC-valid headers dropped because hdr_length > max_length
    length_overflow: int = 0
    #: windows where every detection slot filled (possible missed frames)
    detect_saturated: int = 0
    #: wall-clock split of the two device passes (the analogue of the
    #: reference's per-block work() timing, src/receiver_chain.cpp:84-92)
    time_headers_s: float = 0.0
    time_decode_s: float = 0.0

    def as_dict(self) -> dict:
        return dict(self.__dict__)


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
      verbose: print "Invalid CRC (length N)" to stderr on CRC failures,
        matching the reference's only runtime diagnostic (src/ppdu.cpp:276).

    process_samples() accepts any-length complex or planar chunks, exactly
    like receiver_chain::process_samples (src/receiver_chain.cpp:106).
    """

    def __init__(self, rates: tuple[Rate, ...] = ALL_RATES,
                 max_length: int = 1500,
                 params: ChainParams = DEFAULT_PARAMS,
                 cfo_correct: bool = False,
                 verbose: bool = False):
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
        self.verbose = bool(verbose)
        # Detection capacity: the reference has no cap (its detector tags
        # every plateau). Auto-size ours so even back-to-back minimal
        # frames anywhere in the detect region [0, stride + DETECT_LEAD)
        # cannot exhaust the slots (frames in the lead halo consume slots
        # before the ownership filter).
        if params.max_frames_per_chunk is not None:
            self.max_frames = int(params.max_frames_per_chunk)
        else:
            min_frame = min(params_for(r).frame_samples(0)
                            for r in self.rates)
            self.max_frames = -(-(self.stride + DETECT_LEAD) // min_frame) + 1
        self._chunker = native.Chunker(self.stride, self.window)
        self._valid_fields = {params_for(r).rate_field: r for r in self.rates}
        self._jit_cache: dict = {}
        self.stats = ChainStats()

    # --- jitted device functions (built lazily, cached per chain) --------

    def _headers_fn(self):
        import jax
        from ..models import frontend

        key = "headers"
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(functools.partial(
                frontend.decode_headers_p,
                max_frames=self.max_frames,
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
        self.stats.samples_in += (samples[0].size if isinstance(samples, tuple)
                                  else np.asarray(samples).size)
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
        self.stats.windows += 1
        detect = (jnp.asarray(w_re[: self.stride + DETECT_LEAD]),
                  jnp.asarray(w_im[: self.stride + DETECT_LEAD]))
        t0 = time.perf_counter()
        hdr = self._headers_fn()(detect)
        starts = np.asarray(hdr["starts"])
        self.stats.time_headers_s += time.perf_counter() - t0
        if np.asarray(hdr["valid"]).all():
            # every detection slot filled: frames beyond capacity in this
            # window were silently missed (reference chain has no cap)
            self.stats.detect_saturated += 1
            if self.verbose:
                print(f"Detection saturated ({self.max_frames} slots)",
                      file=sys.stderr)
        owned = (np.asarray(hdr["header_ok"])
                 & (starts >= 0) & (starts < self.stride))
        if not owned.any():
            return []
        self.stats.headers_ok += int(owned.sum())

        stream_dev = (jnp.asarray(w_re), jnp.asarray(w_im))
        fields = np.asarray(hdr["rate_field"])
        lengths = np.asarray(hdr["hdr_length"])
        packets: list[DecodedPacket] = []
        for field_val in np.unique(fields[owned]):
            rate = self._valid_fields.get(int(field_val))
            if rate is None:  # valid-parity header at an unconfigured rate
                self.stats.unknown_rate += int(
                    (owned & (fields == field_val)).sum())
                continue
            over = owned & (fields == field_val) & (lengths > self.max_length)
            if over.any():  # observable, unlike round 1 (ADVICE low #5)
                self.stats.length_overflow += int(over.sum())
            sel = owned & (fields == field_val) & (lengths <= self.max_length)
            if not sel.any():
                continue
            idx = np.nonzero(sel)[0]
            t1 = time.perf_counter()
            out = self._decode_fn(rate)(
                stream_dev, jnp.asarray(starts[idx], jnp.int32))
            crc_ok = np.asarray(out["crc_ok"])
            self.stats.time_decode_s += time.perf_counter() - t1
            payloads = np.asarray(out["payload"], dtype=np.uint8)
            hdr_len = np.asarray(out["hdr_length"])
            for k in range(idx.size):
                if not crc_ok[k]:
                    # reference: report + drop, keep streaming (ppdu.cpp:274-279)
                    self.stats.crc_fail += 1
                    if self.verbose:
                        print(f"Invalid CRC (length {int(hdr_len[k])})",
                              file=sys.stderr)
                    continue
                self.stats.crc_ok += 1
                n = int(hdr_len[k])
                packets.append(DecodedPacket(
                    payload=payloads[k, :n].tobytes(),
                    rate=rate, length=n,
                    start=gpos + int(starts[idx[k]])))
        packets.sort(key=lambda p: p.start)
        return packets
