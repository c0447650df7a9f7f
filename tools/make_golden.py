#!/usr/bin/env python3
"""Build the reference sources into a golden-vector generator and package
the output as tests/golden/golden.npz.

Requires the read-only reference checkout at /root/reference. The compiled
binary and intermediates stay in a scratch dir; only the .npz is committed.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys
import tempfile

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
REF = pathlib.Path("/root/reference/src")
SHIMS = REPO / "tools" / "ref_shims"

REF_SOURCES = [
    "parity.cpp", "viterbi.cpp", "interleaver.cpp", "puncturer.cpp",
    "modulator.cpp", "ppdu.cpp", "symbol_mapper.cpp", "fft.cpp",
    "frame_builder.cpp", "frame_detector.cpp", "timing_sync.cpp",
    "fft_symbols.cpp", "channel_est.cpp", "phase_tracker.cpp",
    "frame_decoder.cpp",
]


def main() -> None:
    out = REPO / "tests" / "golden"
    out.mkdir(parents=True, exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        tdp = pathlib.Path(td)
        binary = tdp / "golden_gen"
        cmd = [
            "g++", "-O2", "-std=c++11", "-mssse3", "-msse4.1",
            f"-I{SHIMS}", f"-I{REF}",
            str(REPO / "tools" / "golden_gen.cpp"),
            *[str(REF / s) for s in REF_SOURCES],
            "-o", str(binary),
        ]
        subprocess.run(cmd, check=True)
        vecdir = tdp / "vec"
        vecdir.mkdir()
        subprocess.run([str(binary), str(vecdir)], check=True)

        arrays: dict[str, np.ndarray] = {}
        for f in sorted(vecdir.iterdir()):
            name = f.stem
            if f.suffix == ".c128":
                arrays[name] = np.fromfile(f, dtype=np.complex128)
            else:
                arrays[name] = np.fromfile(f, dtype=np.uint8)
        np.savez_compressed(out / "golden.npz", **arrays)
        print(f"wrote {out/'golden.npz'} with {len(arrays)} arrays")
        for k, v in sorted(arrays.items()):
            print(f"  {k}: {v.shape} {v.dtype}")


if __name__ == "__main__":
    sys.exit(main())
