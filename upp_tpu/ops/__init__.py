from .geometry import square_distance, index_points
from .fps import fps, fps_gather
from .knn import knn, knn_points, knn_vectors_mean
from .group import group_points
from .chamfer import (nn_distance, chamfer_l1, chamfer_l2, chamfer_l2_split,
                      chamfer_raw)
from .emd import approx_match, match_cost, earth_mover_distance
from .propagate import inverse_distance_interp, propagate
from .corrupt import (gaussian_shell_noise, lidar_noise, separate_point_cloud,
                      scale_translate, rotate_y, jitter, normalize_unit_sphere,
                      pointcloud_scale, pointcloud_translate,
                      random_horizontal_flip, random_input_dropout)
