"""Render a learning-curve PNG from a progress.csv (used for RESULTS.md)."""
import csv
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main(csv_path, out_path, title):
    rows = list(csv.DictReader(open(csv_path)))
    itr = np.array([float(r["Itr"]) for r in rows])
    steps = np.array([float(r["n_timesteps"]) for r in rows])
    pre = np.array([float(r["Step_0-AverageReturn"]) for r in rows])
    post = np.array([float(r["Step_1-AverageReturn"]) for r in rows])
    fig, ax = plt.subplots(figsize=(7, 4.5))
    ax.plot(steps / 1e6, pre, label="pre-update (meta) policy", alpha=0.8)
    ax.plot(steps / 1e6, post, label="post-update (adapted) policy",
            alpha=0.9)
    ax.set_xlabel("environment steps (millions)")
    ax.set_ylabel("average return")
    ax.set_title(title)
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    print("wrote", out_path)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         sys.argv[3] if len(sys.argv) > 3 else "ProMP learning curve")
