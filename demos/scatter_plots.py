"""FID-vs-generation-time scatter plots (reference demos/scatter_plots.ipynb).

The reference hard-codes its paper results; this script reads one or more
result JSON files of the form
  {"label": "DuoDiff", "points": [[fid, seconds_per_image], ...]}
(or falls back to the reference's published numbers, reproduced in
BASELINE.md) and renders the FID-vs-latency trade-off per dataset.

Usage:
  python demos/scatter_plots.py --out scatter.png [--results r1.json r2.json]
"""

import argparse
import json

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# Published reference operating points (BASELINE.md; demos/scatter_plots.ipynb)
REFERENCE_POINTS = {
    "CIFAR-10": {
        "AdaDiff": [[17.89, 1.93], [17.55, 1.63], [24.60, 1.32]],
        "DuoDiff": [[17.89, 1.88], [17.81, 1.45], [17.95, 1.30], [18.67, 1.16]],
    },
    "CelebA-64": {
        "AdaDiff": [[9.99, 1.92], [31.41, 1.36]],
        "DuoDiff": [[9.98, 1.88], [10.08, 1.45], [10.61, 1.30], [12.18, 1.16]],
    },
    "ImageNet-64": {
        "AdaDiff": [[19.19, 5.25], [32.52, 3.90], [51.94, 3.24]],
        "DuoDiff": [[19.19, 5.12], [21.49, 3.80], [25.31, 3.45], [31.26, 3.02]],
    },
    "ImageNet-256": {
        "AdaDiff": [[28.86, 8.66], [44.65, 7.67], [57.64, 7.13]],
        "DuoDiff": [[25.38, 10.94], [27.86, 8.14], [32.34, 7.21], [43.43, 6.27]],
    },
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--results", nargs="*", default=[],
                        help="JSON files with {label, dataset, points}")
    parser.add_argument("--out", default="scatter.png")
    args = parser.parse_args()

    datasets = dict(REFERENCE_POINTS)
    for path in args.results:
        with open(path) as f:
            r = json.load(f)
        datasets.setdefault(r.get("dataset", "custom"), {})[r["label"]] = r["points"]

    n = len(datasets)
    fig, axes = plt.subplots(1, n, figsize=(4.2 * n, 3.6))
    if n == 1:
        axes = [axes]
    for ax, (name, methods) in zip(axes, datasets.items()):
        for label, pts in methods.items():
            fids = [p[0] for p in pts]
            times = [p[1] for p in pts]
            ax.plot(times, fids, "o-", label=label)
        ax.set_title(name)
        ax.set_xlabel("Generation time (s/image)")
        ax.set_ylabel("FID")
        ax.legend()
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
