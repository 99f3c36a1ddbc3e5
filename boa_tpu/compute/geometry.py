"""Body-axis geometry on an axial slice.

Parity: `body_organ_analysis/compute/geometry.py:49-85` `find_axes` — major
axis = farthest-apart convex-hull points of the body mask; minor axis =
perpendicular through the major midpoint, intersected with the drawn body
contour (cv2 drawContours/line rasterization, same as the reference).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Sequence

import cv2 as cv
import numpy as np
from scipy import spatial


@dataclass
class Point:
    x: float
    y: float

    def to_list(self) -> list[float]:
        return [self.x, self.y]


def find_minor_point(contours: Sequence[Any], mid_point: Point,
                     rotated_point: Point, length: int,
                     target_size: tuple[int, ...]) -> Point:
    point = Point(int(mid_point.x + rotated_point.x * length),
                  int(mid_point.y + rotated_point.y * length))
    contour_array = cv.drawContours(np.zeros(target_size), contours,
                                    contourIdx=-1, color=1, thickness=2)
    p_array = cv.line(np.zeros(target_size), [point.x, point.y],
                      [int(mid_point.x), int(mid_point.y)], 1, 2)
    p_options = np.logical_and(contour_array, p_array).nonzero()
    if len(p_options[0]) == 0:
        # degenerate body slice (thin / fragmented mask): the minor-axis
        # ray misses the drawn contour — caller skips the axis metrics
        return None
    # (row, col) -> (x, y)
    return Point(p_options[1][0], p_options[0][0])


def find_axes(middle_slice: np.ndarray) -> tuple[Point, Point, Point, Point]:
    points = np.flip(np.transpose(np.where(middle_slice)))
    try:
        hull_points = points[spatial.ConvexHull(points).vertices]
    except spatial.QhullError:
        # collinear / degenerate slice: no 2D hull exists
        return None, None, None, None
    hdist = spatial.distance.cdist(hull_points, hull_points, metric="euclidean")
    p1_idx, p2_idx = np.unravel_index(hdist.argmax(), hdist.shape)
    major_p1, major_p2 = Point(*hull_points[p1_idx]), Point(*hull_points[p2_idx])
    mid_point = Point((major_p1.x + major_p2.x) // 2,
                      (major_p1.y + major_p2.y) // 2)
    length = sum(middle_slice.shape)
    norm_vector = Point(major_p1.x - major_p2.x, major_p1.y - major_p2.y)
    fac = math.sqrt(norm_vector.x ** 2 + norm_vector.y ** 2)
    norm_vector.x /= fac
    norm_vector.y /= fac

    contours, _ = cv.findContours(middle_slice.astype(np.uint8),
                                  cv.RETR_EXTERNAL, cv.CHAIN_APPROX_SIMPLE)
    minor_p1 = find_minor_point(contours, mid_point,
                                Point(-norm_vector.y, norm_vector.x),
                                length, middle_slice.shape)
    minor_p2 = find_minor_point(contours, mid_point,
                                Point(norm_vector.y, -norm_vector.x),
                                length, middle_slice.shape)
    return major_p1, major_p2, minor_p1, minor_p2
