"""Chain configuration.

Replaces the reference's compile-time #defines (frame_detector.h:12-13,
timing_sync.h:12-14, receiver.h:16) and the usrp_params struct (usrp.h:25-52)
with one frozen dataclass. Everything here is static (trace-time) config.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ChainParams:
    """RX chain tuning parameters.

    Attributes:
      plateau_threshold:  normalized STS autocorrelation threshold
                          (reference PLATEAU_THRESHOLD, frame_detector.h:12).
      sts_plateau_length: consecutive above-threshold samples before a
                          plateau is declared (STS_PLATEAU_LENGTH).
      lts_corr_threshold: normalized LTS cross-correlation peak threshold
                          (LTS_CORR_THRESHOLD, timing_sync.h:12).
      sts_length:         autocorrelation lag / window (STS period).
      lts_search:         samples after an STS end in which to search for
                          LTS peaks. The reference searches
                          CARRYOVER_LENGTH - LTS_LENGTH = 96 positions
                          (timing_sync.cpp:75), but that geometry misses
                          any frame whose STS plateau persists to the
                          final STS sample: the second LTS peak then sits
                          exactly one sample past the window, and earlier
                          noise-induced plateau breaks push it further
                          out (measured 73/256 frames lost at 16 dB SNR,
                          1/256 at 24 dB). Default 128 closes the boundary
                          (1/256 at 16 dB, 0 above; docs/NOTES_r3.md);
                          set 96 for reference-parity behavior.
      chunk_size:         streaming chunk length (NUM_RX_SAMPLES,
                          receiver.h:16). This is the frame-ownership and
                          feed granularity; device work is batched into
                          supersteps of strides_per_step chunks.
      max_frames_per_chunk: detection capacity per chunk in the streaming
                          receiver (fixed shapes under jit).
                          None (default) = auto-size from the chunk length
                          and the shortest decodable frame, so back-to-back
                          minimal frames can never exceed the slot count.
      strides_per_step:   chunks batched into ONE device dispatch + ONE
                          result fetch by the streaming receiver. The
                          host<->device transport is latency-bound per
                          transaction (~22 ms round-trip on a tunneled
                          TPU; docs/NOTES_r3.md), so throughput scales
                          with chunk_size * strides_per_step until
                          ingest bandwidth caps it. None (default) =
                          auto: ~2^20 samples per superstep on
                          accelerator backends, 1 chunk on CPU (tests /
                          latency-parity). Delivery latency grows with
                          the superstep: chunk_size * strides_per_step
                          samples of stream time.
      min_frame_samples:  shortest frame the detection capacity must
                          accommodate. None (default) = the shortest
                          frame any configured rate can produce (the
                          exact no-silent-drop bound). A tuned pipeline
                          that only carries, say, 1500-byte frames can
                          raise this to shrink the per-superstep header
                          capacity (SIGNAL decodes scale with slot
                          count); overflow is still observable via
                          stats.detect_saturated.
    """

    plateau_threshold: float = 0.9
    sts_plateau_length: int = 16
    lts_corr_threshold: float = 0.9
    sts_length: int = 16
    lts_search: int = 128
    chunk_size: int = 4096
    max_frames_per_chunk: int | None = None
    strides_per_step: int | None = None
    min_frame_samples: int | None = None


DEFAULT_PARAMS = ChainParams()
