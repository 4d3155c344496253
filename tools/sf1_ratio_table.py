"""Render the sf0.1-vs-sf1 per-leg wall-ratio table (BENCH/BASELINE.md r5).

Usage: python tools/sf1_ratio_table.py /tmp/bench_r5_sf01.json /tmp/bench_r5_sf1.json

Input-scaled legs should show wall ratios <= ~10x for 10x input (linear
or better thanks to fixed per-job costs amortizing); constant-work legs
(fixed-size query subsets, the generated-corpus spine) should hold flat.
A leg whose ratio far exceeds its input growth is a superlinear-scaling
flag.
"""
from __future__ import annotations

import json
import sys


def main(a_path: str, b_path: str) -> None:
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    qa, qb = a["queries"], b["queries"]
    print("| leg | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|")
    tot_a = tot_b = 0.0
    for leg in qa:
        if leg not in qb:
            continue
        ra, rb = qa[leg], qb[leg]
        tot_a += ra
        tot_b += rb
        print(f"| {leg} | {ra:.2f} | {rb:.2f} | {rb / ra:.1f}x |")
    print(f"| **total** | **{tot_a:.2f}** | **{tot_b:.2f}** | "
          f"**{tot_b / tot_a:.1f}x** |")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
