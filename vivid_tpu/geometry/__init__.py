from .codec import (MEAN, STD, compose_K, decompose_K, compose_geometry,
                    decompose_geometry, resize_geometry, expand_extrinsics)
from .epipolar import get_epipolar_dist, get_epipolar_attn
from .warp import warp_image, get_warped_features
