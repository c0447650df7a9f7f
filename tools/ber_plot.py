#!/usr/bin/env python3
"""Render docs/ber_curves.png from docs/ber_data.json.

Encoding: color = modulation family (4 categorical hues in fixed slot
order from a validated palette), linestyle = coding rate (secondary
encoding, so identity is never color-alone). PER on a log scale vs SNR -
the standard waterfall view. Static figure for docs; the raw numbers live
in docs/BER.md / ber_data.json (the accessible table view).
"""

from __future__ import annotations

import json
import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: validated categorical slots 1-4 (dataviz default palette, fixed order)
FAMILY_COLOR = {
    "BPSK": "#2a78d6",
    "QPSK": "#eb6834",
    "QAM16": "#1baf7a",
    "QAM64": "#eda100",
}
CODE_STYLE = {"1_2": "-", "2_3": "--", "3_4": ":"}
CODE_LABEL = {"1_2": "1/2", "2_3": "2/3", "3_4": "3/4"}

TEXT = "#333"
GRID = "#e6e6e6"


def split_rate(name: str):
    # RATE_3_4_QAM16 -> ("3_4", "QAM16")
    parts = name.split("_")
    return parts[1] + "_" + parts[2], parts[3]


def main() -> int:
    with open(os.path.join(_REPO, "docs", "ber_data.json")) as f:
        data = json.load(f)
    snr = data["snr_db"]
    floor = 1.0 / (2 * data["frames_per_point"])

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.4), dpi=150)
    for ax, key, title in ((axes[0], "per", "Packet error rate"),
                           (axes[1], "ber", "Payload bit error rate")):
        for c in data["curves"]:
            if c["mode"] != "sync" or c["channel"] != "awgn":
                continue
            code, fam = split_rate(c["rate"])
            y = [max(v, floor if key == "per" else 1e-7)
                 for v in c[key]]
            ax.plot(snr, y, CODE_STYLE[code], color=FAMILY_COLOR[fam],
                    linewidth=2, marker="o", markersize=3.5)
        ax.set_yscale("log")
        ax.set_xlabel("SNR (dB)", color=TEXT)
        ax.set_title(title + " — AWGN, frame-synchronous", color=TEXT,
                     fontsize=11)
        ax.grid(True, color=GRID, linewidth=0.6)
        ax.tick_params(colors=TEXT)
        for s in ax.spines.values():
            s.set_color(GRID)
        ax.set_ylim(floor if key == "per" else 1e-7, 1.5)

    # composite legend: hue = modulation, linestyle = code rate
    from matplotlib.lines import Line2D
    handles = [Line2D([], [], color=v, linewidth=3, label=k)
               for k, v in FAMILY_COLOR.items()]
    handles += [Line2D([], [], color=TEXT, linestyle=s, linewidth=2,
                       label=f"rate {CODE_LABEL[k]}")
                for k, s in CODE_STYLE.items()]
    axes[1].legend(handles=handles, fontsize=8, frameon=False,
                   labelcolor=TEXT, loc="lower left")
    fig.suptitle("fun_ofdm_tpu 802.11a PHY error-rate baseline "
                 f"({data['frames_per_point']} frames/point, "
                 f"{data['length']}-byte payloads)",
                 color=TEXT, fontsize=12)
    fig.tight_layout()
    out = os.path.join(_REPO, "docs", "ber_curves.png")
    fig.savefig(out, facecolor="white")
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
