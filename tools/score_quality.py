"""FD-rand + spectral scoring of a quality-matrix sample directory.

Post-processes a `tools/quality_matrix.py --out` directory: for every method
subdir with sample PNGs it computes

- **fd_rand_vs_real / fd_rand_vs_dense** — Frechet distance on seeded
  random-init InceptionV3 pool3 features (duodiff_tpu.evaluation.metrics)
  against freshly drawn reference images from the KNOWN synthetic
  distribution, and against the dense-DDPM baseline row (isolates what the
  speed knob itself costs, independent of model underfit);
- **spec_vs_real / spec_vs_dense** — RMS radial log-power-spectrum distance
  (texture/high-frequency damage, invisible to mode statistics).

A `real_vs_real` row (two independent reference draws) gives the sampling
noise floor for both metrics at this N. Results merge into the directory's
quality_matrix.json rows and are also written (ranked by fd_rand_vs_dense)
to fd_table.json.

    python tools/score_quality.py --out /tmp/duodiff_quality/qm \
        --distribution palette --palette_k 4 --ref_n 512
"""

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from convergence_probe import (  # noqa: E402 (tools/ sibling)
    PALETTES,
    TEXTURE_CLASSES,
    make_palette_images,
    make_textured_images,
)


def _is_final_sample(p: Path) -> bool:
    # the samplers write {i}.png finals, {i}_{t}.png intermediate saves
    # (--timesteps_save), and grid images; only finals belong in a quality
    # feature set — half-denoised intermediates would silently poison it
    return p.stem.isdigit()


def read_method_images(d: Path) -> np.ndarray | None:
    from PIL import Image

    pngs = [p for p in sorted(d.glob("*.png")) if _is_final_sample(p)]
    if not pngs:
        return None
    return np.stack([
        np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
        for p in pngs
    ])


def draw_reference(distribution: str, palette_k: int, n: int, size: int,
                   seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    if distribution == "textured":
        ks = rng.randint(0, len(TEXTURE_CLASSES), n)
        return make_textured_images(rng, ks, size).astype(np.float32) / 255.0
    palette = PALETTES[palette_k]
    ks = rng.randint(0, len(palette), n)
    return make_palette_images(rng, ks, palette, size).astype(np.float32) / 255.0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, required=True,
                    help="quality_matrix.py --out directory")
    ap.add_argument("--distribution", type=str, default="palette",
                    choices=["palette", "textured"])
    ap.add_argument("--palette_k", type=int, default=4, choices=[1, 4, 8])
    ap.add_argument("--ref_n", type=int, default=512,
                    help="reference draws per reference set (two sets are "
                         "drawn: metrics vs set A, noise floor A-vs-B)")
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--baseline", type=str, default="ddpm",
                    help="method subdir used as the dense reference for the "
                         "*_vs_dense columns")
    ap.add_argument("--batch_size", type=int, default=32,
                    help="inception feature-extraction batch")
    ap.add_argument("--methods", type=str, default=None,
                    help="comma list to restrict scoring (default: every "
                         "subdir with PNGs)")
    args = ap.parse_args(argv)

    from duodiff_tpu.evaluation.fid import extract_features, fid_from_features
    from duodiff_tpu.evaluation.metrics import (
        radial_power_spectrum,
        random_inception,
        spectral_distance,
        standardize_features,
    )

    out_root = Path(args.out)
    method_dirs = {
        d.name: d for d in sorted(out_root.iterdir())
        if d.is_dir() and any(_is_final_sample(p) for p in d.glob("*.png"))
    }
    if args.methods:
        # the baseline stays in scope: its samples anchor the *_vs_dense
        # columns (and its row is deterministic at a fixed seed, so
        # re-scoring it alongside a restricted method set is harmless)
        keep = set(args.methods.split(",")) | {args.baseline}
        method_dirs = {k: v for k, v in method_dirs.items() if k in keep}
    if args.baseline not in method_dirs:
        raise SystemExit(f"baseline method '{args.baseline}' has no samples "
                         f"under {out_root}")

    images = {name: read_method_images(d) for name, d in method_dirs.items()}
    size = images[args.baseline].shape[1]
    n_base = images[args.baseline].shape[0]
    # ref A (ref_n draws) anchors the *_vs_real columns and the feature
    # standardization; B and C are n_base-sized draws so the two noise
    # floors match their columns' set-size geometry EXACTLY — the Frechet
    # estimator's N<D bias is large and N-dependent, so floors at a
    # different N would not be comparable to the method rows
    ref_a = draw_reference(args.distribution, args.palette_k, args.ref_n,
                           size, args.seed)
    ref_b = draw_reference(args.distribution, args.palette_k, n_base,
                           size, args.seed + 1)
    ref_c = draw_reference(args.distribution, args.palette_k, n_base,
                           size, args.seed + 2)

    model, params = random_inception()
    feats = {}

    def features(name, imgs):
        if name not in feats:
            raw = extract_features(model, params, imgs, args.batch_size)
            # standardized by ref A's per-dim stats (scale-free FD-rand;
            # random-init activations are ~1e-4 scale raw — see
            # evaluation.metrics.standardize_features)
            feats[name] = standardize_features(_ref_raw, [raw])[0]
        return feats[name]

    _ref_raw = extract_features(model, params, ref_a, args.batch_size)
    feats["__ref_a"] = standardize_features(_ref_raw, [_ref_raw])[0]
    fa = feats["__ref_a"]
    fb = features("__ref_b", ref_b)
    fc = features("__ref_c", ref_c)
    fdense = features(args.baseline, images[args.baseline])
    spec_a = radial_power_spectrum(ref_a)
    spec_dense = radial_power_spectrum(images[args.baseline])

    rows = {
        # matched-geometry noise floors: vs_real at (ref_n, n_base),
        # vs_dense at (n_base, n_base) — fresh draws of the TRUE
        # distribution, so any method row above these is real signal
        "real_vs_real": {
            "n": int(n_base),
            "fd_rand_vs_real": round(fid_from_features(fa, fb), 4),
            "fd_rand_vs_dense": round(fid_from_features(fb, fc), 4),
            "spec_vs_real": round(spectral_distance(ref_a, ref_b), 5),
            "spec_vs_dense": round(spectral_distance(ref_b, ref_c), 5),
        }
    }
    for name, imgs in images.items():
        f = features(name, imgs)
        spec = radial_power_spectrum(imgs)
        rows[name] = {
            "n": int(imgs.shape[0]),
            "fd_rand_vs_real": round(fid_from_features(fa, f), 4),
            "fd_rand_vs_dense": round(fid_from_features(fdense, f), 4),
            "spec_vs_real": round(
                float(np.sqrt(np.mean((spec - spec_a) ** 2))), 5),
            "spec_vs_dense": round(
                float(np.sqrt(np.mean((spec - spec_dense) ** 2))), 5),
        }
        print(json.dumps({"method": name, **rows[name]}))

    ranked = dict(sorted(
        rows.items(),
        key=lambda kv: kv[1].get("fd_rand_vs_dense", -1.0),
    ))
    table = {
        "distribution": args.distribution,
        "baseline": args.baseline,
        "ref_n": args.ref_n,
        "seed": args.seed,
        "feature": "random-init InceptionV3 pool3 (seed 2026)",
        "rows": ranked,
    }
    (out_root / "fd_table.json").write_text(json.dumps(table, indent=1))

    # merge into quality_matrix.json so each method row carries its FD fields
    qm_path = out_root / "quality_matrix.json"
    if qm_path.exists():
        try:
            qm = json.loads(qm_path.read_text())
        except (json.JSONDecodeError, OSError):
            qm = {}
        for name, r in rows.items():
            if name in qm:
                qm[name].update(r)
        qm_path.write_text(json.dumps(qm, indent=1))

    print(json.dumps(table))
    return table


if __name__ == "__main__":
    main()
