from . import convcode, crc32, fft64, interleave, mapper, puncture, qam, scramble, viterbi  # noqa: F401
