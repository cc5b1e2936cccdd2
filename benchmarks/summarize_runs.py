"""Generate the learning-validation results table from committed
progress.csv files (used to regenerate benchmarks/RESULTS.md §5).

Run:  python benchmarks/summarize_runs.py [run_dir ...]
"""
from __future__ import annotations

import csv
import os
import sys


def summarize(run_dir, k=5):
    path = os.path.join(run_dir, "progress.csv")
    rows = list(csv.DictReader(open(path)))
    if not rows:
        return None

    def col(name):
        return [float(r[name]) for r in rows if r.get(name) not in ("", None)]

    # last sampling round = the post-update one (num_inner_grad_steps=1)
    steps = sorted({c.split("-")[0] for c in rows[0]
                    if c.startswith("Step_")})
    pre = col(f"{steps[0]}-AverageReturn")
    post = col(f"{steps[-1]}-AverageReturn")
    gap = [b - a for a, b in zip(pre, post)]
    n = len(rows)

    def m(x, sl):
        seg = x[sl]
        return sum(seg) / len(seg)

    return dict(
        name=os.path.basename(run_dir.rstrip("/")), n=n,
        pre_first=m(pre, slice(0, k)), pre_last=m(pre, slice(-k, None)),
        post_first=m(post, slice(0, k)), post_last=m(post, slice(-k, None)),
        gap_first=m(gap, slice(0, k)), gap_last=m(gap, slice(-k, None)),
        frac=sum(g > 0 for g in gap) / n,
    )


def main(dirs):
    print("| run | iters | pre-update return | post-update return "
          "| gap (first->last 5) | post>pre |")
    print("|---|---|---|---|---|---|")
    for d in dirs:
        s = summarize(d)
        if s is None:
            print(f"| {os.path.basename(d)} | (empty) | | | | |")
            continue
        print(f"| {s['name']} | {s['n']} "
              f"| {s['pre_first']:.1f} -> {s['pre_last']:.1f} "
              f"| {s['post_first']:.1f} -> **{s['post_last']:.1f}** "
              f"| {s['gap_first']:+.1f} -> **{s['gap_last']:+.1f}** "
              f"| {s['frac']*100:.0f}% |")


if __name__ == "__main__":
    dirs = sys.argv[1:] or sorted(
        d.path for d in os.scandir("benchmarks/validation") if d.is_dir())
    main(dirs)
