from vlp3d.ops.ball_query import ball_query, query_and_group
from vlp3d.ops.grouping import gather_points, group_points
from vlp3d.ops.interpolate import (
    interpolate_features,
    three_interpolate,
    three_nn,
)
from vlp3d.ops.sampling import furthest_point_sample

__all__ = [
    "ball_query",
    "query_and_group",
    "gather_points",
    "group_points",
    "three_nn",
    "three_interpolate",
    "interpolate_features",
    "furthest_point_sample",
]
