"""Pure (vispy-free) annotation-picking logic, unit-testable.

The reference embeds this math in its mouse handler
(``/root/reference/ui/vispy_view.py:126-168``): a screen click defines a ray
(p0, p1) in scene coordinates; the distance of each cloud point to that ray
is the norm of the cross product; clicking within ``remove_threshold`` of an
already-annotated point removes it, otherwise the nearest point to the ray
is annotated.
"""

from typing import Optional, Tuple

import numpy as np

REMOVE_THRESHOLD = 0.01  # scene units, reference vispy_view.py:152


def ray_point_distances(
    p0: np.ndarray, p1: np.ndarray, points: np.ndarray
) -> np.ndarray:
    """Distance of each point to the (p0, p1) ray: ‖(p1−p0) × (p0−points)‖
    (assumes p1−p0 is unit-normalised by the projective transform, like the
    reference's usage)."""
    return np.linalg.norm(np.cross(p1 - p0, p0 - points), axis=1)


def pick_annotation(
    p0: np.ndarray,
    p1: np.ndarray,
    cloud: np.ndarray,
    annotation: Optional[np.ndarray],
    remove_threshold: float = REMOVE_THRESHOLD,
) -> Tuple[str, np.ndarray]:
    """Resolve a click ray into an annotation update.

    :param p0, p1: two points on the click ray in scene coordinates.
    :param cloud: (N, 3) point cloud.
    :param annotation: (N,) bool mask or None.
    :return: ("remove"|"add", new (N,) bool mask).
    """
    if annotation is not None and annotation.any():
        annotated_points = cloud[annotation.astype(bool)]
        lookup = np.where(annotation.astype(bool))[0]
        d = ray_point_distances(p0, p1, annotated_points)
        min_idx = int(np.argmin(d))
        if d[min_idx] < remove_threshold:
            new_annotation = annotation.astype(bool).copy()
            new_annotation[lookup[min_idx]] = False
            return "remove", new_annotation

    d = ray_point_distances(p0, p1, cloud)
    min_idx = int(np.argmin(d))
    new_annotation = (
        np.zeros(len(cloud), dtype=bool)
        if annotation is None
        else annotation.astype(bool).copy()
    )
    new_annotation[min_idx] = True
    return "add", new_annotation


def display_subsample(
    pos: Optional[np.ndarray], max_points: int = 10000
) -> Optional[np.ndarray]:
    """Random display subsample (≤ max_points), matching the reference's
    marker set_data behaviour (vispy_view.py:24-28)."""
    if pos is None or len(pos) == 0:
        return pos
    size = min(max_points, len(pos))
    selection = np.random.choice(len(pos), size=size, replace=False)
    return pos[selection, :]
