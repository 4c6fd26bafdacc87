from duodiff_tpu.evaluation.fid import (
    compute_statistics,
    extract_features,
    fid_from_features,
    frechet_distance,
)

__all__ = [
    "compute_statistics",
    "extract_features",
    "frechet_distance",
    "fid_from_features",
]
