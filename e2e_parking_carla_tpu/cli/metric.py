"""Offline CSV aggregator (reference: tool/metric.py — which hardcodes its
input path; here it's an argument).

    python -m e2e_parking_carla_tpu.cli.metric --result_dir ./eva_result
"""

from __future__ import annotations

import argparse

from e2e_parking_carla_tpu.eval.csv_io import aggregate_result_csvs


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--result_dir", required=True)
    p.add_argument("--out_dir", default=None)
    args = p.parse_args(argv)
    mean_path, std_path = aggregate_result_csvs(args.result_dir, args.out_dir)
    print(f"wrote {mean_path} and {std_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
