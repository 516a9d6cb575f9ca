"""Assemble the paper-Table-III ablation comparison from eval CSV dirs.

Reference numbers: resource/E2E_APA_IV24_final.pdf Table III via BASELINE.md
(full model TSR 91.41; w/o depth supervision 77.08; w/o speed limit 81.51;
MLP decoder 83.33). Our rows are same-budget 12k-step b0 runs with the
flagship recipe (tools/r4_remainder.sh stage_ablate); the speed-limit row is
eval-only on the 30k flagship (the ablation flips an eval-time behavior,
reference carla_parking_eva.py --no_speed_limit analog).

Usage: python tools/ablation_table.py
"""
import csv
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROWS = [
    # (label, eval dir, paper TSR)
    ("full model (12k same-budget baseline)", "eva_result_b0_base12k", 91.41),
    ("w/o depth supervision", "eva_result_b0_nodepth", 77.08),
    ("MLP decoder", "eva_result_b0_mlp", 83.33),
    ("w/o speed limit (flagship, eval-only)", "eva_result_b0_nosl", 81.51),
    ("flagship 30k (for reference)", "eva_result_b0_r4", 91.41),
]


def read_mean(d):
    path = os.path.join(ROOT, d, "result_mean.csv")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return {k: float(v) for k, v in next(csv.DictReader(f)).items()}


def main():
    print(f"| configuration | TSR | CR | TR | paper TSR |")
    print(f"|---|---|---|---|---|")
    for label, d, paper in ROWS:
        m = read_mean(d)
        if m is None:
            print(f"| {label} | — | — | — | {paper} | (missing: {d})")
            continue
        print(f"| {label} | {m['TSR']:.2f} | {m['CR']:.2f} | "
              f"{m['TR']:.2f} | {paper} |")


if __name__ == "__main__":
    main()
