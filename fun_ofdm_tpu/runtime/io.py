"""Sample I/O backends: the reference usrp wrapper's role, radio-free.

The reference's usrp class (src/usrp.cpp:20-130) does three jobs: carry
radio configuration (usrp_params, src/usrp.h:25-52), push TX bursts
(send_burst_sync, src/usrp.cpp:91-114), and pull RX sample chunks
(get_samples, src/usrp.cpp:125-130). With no radio hardware in the TPU
build, those roles map to:

  * RadioParams       — the usrp_params equivalent (kept field-for-field so
                        reference users find their knobs; frequencies/gains
                        are metadata for file/loopback backends).
  * LoopbackRadio     — an in-process radio bus over the native sample ring
                        (csrc/stream_runtime.cpp): TX bursts go in, RX
                        chunks come out, optionally through a channel
                        impairment function (AWGN/CFO/multipath from
                        sim/channel.py). This is the hardware-free
                        transceiver path (reference examples run two
                        processes on two USRPs; here one process, one bus).
  * FileSource/FileSink — capture replay and recording (interleaved
                        complex64, the common SDR file format).

All sources yield planar (re, im) float32 numpy arrays; get_samples always
returns exactly n samples (zero/noise-filled when the bus runs dry, like a
real radio's constant sample clock).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

from .native import SampleRing, _planar_f32


@dataclass(frozen=True)
class RadioParams:
    """Radio configuration (reference usrp_params, src/usrp.h:25-52).

    freq/sample_rate/gains are carried for API parity and used where they
    matter (tx_amp scales TX bursts exactly like usrp::send_burst,
    src/usrp.cpp:94; sample_rate paces idle loopback reads).
    """

    freq: float = 5.72e9
    sample_rate: float = 5e6
    tx_gain: float = 20.0
    rx_gain: float = 20.0
    tx_amp: float = 1.0
    device_addr: str = ""


class LoopbackRadio:
    """In-process TX→RX radio bus (native ring buffer transport).

    channel: optional host-side impairment applied per burst —
      fn(re, im) -> (re, im), e.g. an AWGN/CFO composition built from
      sim/channel.py (jitted JAX or plain numpy both work).
    noise_floor: std-dev of gaussian fill when the bus is idle (0 = zeros).
    """

    def __init__(self, params: RadioParams = RadioParams(),
                 channel: Optional[Callable] = None,
                 noise_floor: float = 0.0,
                 capacity: int = 1 << 22,
                 pace_idle: bool = False):
        self.params = params
        self._channel = channel
        self._noise_floor = noise_floor
        self._pace_idle = pace_idle
        self._ring = SampleRing(capacity)
        self._rng = np.random.default_rng(0)
        self._lock = threading.Lock()

    # --- TX side (reference usrp::send_burst_sync, src/usrp.cpp:91) ------

    def send_burst(self, samples) -> None:
        re, im = _planar_f32(samples)
        amp = np.float32(self.params.tx_amp)
        re, im = re * amp, im * amp
        if self._channel is not None:
            re, im = self._channel(re, im)
            re = np.ascontiguousarray(re, np.float32)
            im = np.ascontiguousarray(im, np.float32)
        self._ring.push((re, im))

    send_burst_sync = send_burst  # parity alias; loopback push is sync

    # --- RX side (reference usrp::get_samples, src/usrp.cpp:125) ---------

    def get_samples(self, n: int):
        """Exactly n planar samples; idle bus yields noise-floor fill."""
        re, im = self._ring.pop(n, blocking=False)
        if re.size < n:
            if self._pace_idle:
                # emulate the radio's sample clock so idle RX loops don't spin
                time.sleep((n - re.size) / self.params.sample_rate)
                re2, im2 = self._ring.pop(n - re.size, blocking=False)
                re = np.concatenate([re, re2])
                im = np.concatenate([im, im2])
            pad = n - re.size
            if pad:
                if self._noise_floor > 0.0:
                    with self._lock:
                        fre = self._rng.normal(0, self._noise_floor, pad)
                        fim = self._rng.normal(0, self._noise_floor, pad)
                    fre = fre.astype(np.float32)
                    fim = fim.astype(np.float32)
                else:
                    fre = np.zeros(pad, np.float32)
                    fim = np.zeros(pad, np.float32)
                re = np.concatenate([re, fre])
                im = np.concatenate([im, fim])
        return re, im

    @property
    def pending(self) -> int:
        return len(self._ring)

    def close(self) -> None:
        self._ring.close()


class FileSource:
    """Replay a recorded capture (interleaved complex64 file)."""

    def __init__(self, path: str, params: RadioParams = RadioParams()):
        self.params = params
        self._f = open(path, "rb")
        self.exhausted = False

    def get_samples(self, n: int):
        buf = self._f.read(n * 8)  # complex64 = 8 bytes
        x = np.frombuffer(buf, dtype=np.complex64)
        if x.size < n:
            self.exhausted = True
            x = np.concatenate([x, np.zeros(n - x.size, np.complex64)])
        return (np.ascontiguousarray(x.real, np.float32),
                np.ascontiguousarray(x.imag, np.float32))

    def close(self) -> None:
        self._f.close()


class FileSink:
    """Record TX bursts to an interleaved complex64 file."""

    def __init__(self, path: str, params: RadioParams = RadioParams()):
        self.params = params
        self._f = open(path, "wb")

    def send_burst(self, samples) -> None:
        re, im = _planar_f32(samples)
        amp = np.float32(self.params.tx_amp)
        (re * amp + 1j * (im * amp)).astype(np.complex64).tofile(self._f)

    send_burst_sync = send_burst

    def close(self) -> None:
        self._f.close()
