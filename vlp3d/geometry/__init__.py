from vlp3d.geometry.boxes import (
    box3d_diou,
    box3d_iou_aabb,
    box3d_iou_corners,
    corners_to_aabb,
    get_3d_box_batch,
    roty_batch,
    rotz_batch,
)
from vlp3d.geometry.nn_distance import huber_loss, nn_distance

__all__ = [
    "box3d_diou",
    "box3d_iou_aabb",
    "box3d_iou_corners",
    "corners_to_aabb",
    "get_3d_box_batch",
    "roty_batch",
    "rotz_batch",
    "huber_loss",
    "nn_distance",
]
