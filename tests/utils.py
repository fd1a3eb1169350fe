"""Shared synthetic generators, mirroring the reference's
``tests/test-utils/include/test-utils/utils.h:36-90`` (and the Python twin at
``tests/python/test_matching.py:5-37``)."""
import numpy as np


def make_rotation(angle: float) -> np.ndarray:
    s, c = np.sin(angle), np.cos(angle)
    return np.array([[c, -s], [s, c]], np.float32)


def create_lines(line_number: int, length: float) -> np.ndarray:
    """(N, 4) lines from the origin at log-spaced angles (avoids symmetries)."""
    angles = np.logspace(np.log10(2 * np.pi), np.log10(4 * np.pi), line_number)
    out = np.zeros((line_number, 4), np.float32)
    for i, a in enumerate(angles):
        end = make_rotation(a) @ np.array([length, 0.0], np.float32)
        out[i, 2:] = end
    return out


def apply_transform(lines: np.ndarray, mat23: np.ndarray) -> np.ndarray:
    """Affine-transform (N, 4) lines by a 2x3 matrix (host/numpy)."""
    r, t = mat23[:2, :2], mat23[:2, 2]
    a = lines[:, 0:2] @ r.T + t
    b = lines[:, 2:4] @ r.T + t
    return np.concatenate([a, b], axis=1).astype(np.float32)
