#!/usr/bin/env python3
"""Render docs/campaign.png: the Dataset-A accuracy-parity campaign.

One series (ring-class accuracy per campaign stage, exact reference
recipe unless noted) against the reference's 96.5 % headline as a
dashed target rule.  Stages/values mirror VALIDATION.md §2; re-run this
script whenever a new stage lands.
"""

import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# (stage label, ring-class accuracy %, round)
STAGES = [
    ("bf16 recipe\n(rounds 1-2)", 92.43, "r1-2"),
    ("+ blur-free data\n+ lanczos resize", 93.58, "r3"),
    ("+ f32 + glorot\n+ Adam eps", 95.26, "r3"),
    ("150 epochs\n(plateau)", 95.40, "r3"),
    ("true full-f32\n(dtype bug fixed)", 95.48, "r4"),
    ("input 384\n(resolution lever)", 96.20, "r4"),
    ("384 mixed\n150 ep", 96.22, "r4"),
    ("+ 4-view flip-TTA\n(beats reference)", 96.67, "r4"),
]
REFERENCE = 96.5

SURFACE = "#fcfcfb"
SERIES = "#2a78d6"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"
GRID = "#e6e5e1"


def main(extra=()):
    stages = STAGES + list(extra)
    xs = range(len(stages))
    ys = [s[1] for s in stages]

    fig, ax = plt.subplots(figsize=(8.6, 4.4), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    ax.axhline(REFERENCE, color=TEXT2, lw=1.2, ls=(0, (5, 4)), zorder=1)
    ax.annotate(f"reference (Titan X, 100 ep): {REFERENCE} %",
                xy=(0.02, REFERENCE), xycoords=("axes fraction", "data"),
                xytext=(0, 5), textcoords="offset points",
                color=TEXT2, fontsize=8.5)

    ax.plot(xs, ys, color=SERIES, lw=2, zorder=3)
    ax.scatter(xs, ys, s=52, color=SERIES, zorder=4)
    for x, y in zip(xs, ys):
        ax.annotate(f"{y:.2f}", xy=(x, y), xytext=(0, -14),
                    textcoords="offset points", ha="center",
                    color=TEXT, fontsize=9)

    ax.set_xticks(list(xs))
    ax.set_xticklabels([s[0] for s in stages], fontsize=8.2, color=TEXT)
    ax.set_ylabel("ring-class accuracy (%)", color=TEXT, fontsize=9.5)
    ax.set_ylim(91.8, 97.3)
    ax.set_title(
        "Dataset-A parity campaign: exact reference recipe, "
        "one fix at a time", color=TEXT, fontsize=11, pad=10)
    ax.tick_params(colors=TEXT2, labelsize=8.5)
    ax.grid(axis="y", color=GRID, lw=0.8, zorder=0)
    for side in ("top", "right", "left"):
        ax.spines[side].set_visible(False)
    ax.spines["bottom"].set_color(GRID)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "campaign.png")
    fig.tight_layout()
    fig.savefig(out, facecolor=SURFACE)
    print(f"wrote {out}")


if __name__ == "__main__":
    extra = []
    for arg in sys.argv[1:]:
        label, val = arg.rsplit("=", 1)
        extra.append((label.replace("\\n", "\n"), float(val), "r4"))
    main(extra)
