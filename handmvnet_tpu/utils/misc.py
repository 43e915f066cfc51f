"""Small utilities (reference: src/utils/misc.py:50-56 param stats)."""

from __future__ import annotations

import jax
import numpy as np


def param_count(params) -> float:
    """Total parameters in millions."""
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params)) / 1e6


def param_size(params) -> float:
    """Size in MB assuming fp32 (the reference's convention, misc.py:54-56)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params)) * 4 / (1024 * 1024)


def rotate_y(points: np.ndarray, angle: float) -> np.ndarray:
    """Rotate [N, 3] points around the Y axis (reference misc.py:4-7)."""
    c, s = np.cos(angle), np.sin(angle)
    ry = np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
    return points @ ry
