from duodiff_tpu.evaluation.fid import (
    compute_statistics,
    extract_features,
    fid_from_features,
    frechet_distance,
)
from duodiff_tpu.evaluation.metrics import (
    fd_rand,
    radial_power_spectrum,
    random_inception,
    spectral_distance,
)

__all__ = [
    "compute_statistics",
    "extract_features",
    "frechet_distance",
    "fid_from_features",
    "fd_rand",
    "radial_power_spectrum",
    "random_inception",
    "spectral_distance",
]
