from duodiff_tpu.utils.train_utils import get_exp_name
from duodiff_tpu.utils.image import make_grid, save_image, save_samples

__all__ = ["get_exp_name", "make_grid", "save_image", "save_samples"]
