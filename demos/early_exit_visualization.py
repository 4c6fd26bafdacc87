"""Exit-layer-vs-timestep curves (reference demos/early_exit_visualization.ipynb).

Reads the diagnostics the eesampler CLI writes
(indices_by_timestep.npy (T, B), error_prediction_by_timestep.npy (T, depth))
for one or more runs and plots mean exit layer against denoising timestep —
the curves behind the AdaDiff threshold analysis.

Usage:
  python demos/early_exit_visualization.py out_dir1 [out_dir2 ...] --out ee.png
"""

import argparse
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("run_dirs", nargs="+",
                        help="eesampler output folders (one per threshold)")
    parser.add_argument("--out", default="early_exit.png")
    args = parser.parse_args()

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
    for d in args.run_dirs:
        d = Path(d)
        idx = np.load(d / "indices_by_timestep.npy")  # (T, B)
        err = np.load(d / "error_prediction_by_timestep.npy")  # (T, depth)
        ts = np.arange(idx.shape[0])
        ax1.plot(ts, idx.mean(axis=1), label=d.name)
        ax2.plot(ts, err.mean(axis=1), label=d.name)
    ax1.set_xlabel("timestep t")
    ax1.set_ylabel("mean exit layer")
    ax1.set_title("Exit layer vs timestep")
    ax2.set_xlabel("timestep t")
    ax2.set_ylabel("mean predicted error")
    ax2.set_title("Probe output vs timestep")
    for ax in (ax1, ax2):
        ax.legend()
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
