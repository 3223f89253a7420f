"""File formats: Oxford ellipse files, upright-affine shape files, homography
loaders.  Byte-format-compatible with the reference CLIs.

  - Oxford .ells: header '1.0\\n<N>\\n' then rows 'x y a b c' at %10.10f
    (examples/hesaffnet/hesaffnet.py:58-60 + Utils.line_prepender)
  - upright affine: rows 'a11 0 a21 a22' at %10.5f
    (examples/just_shape/detect_affine_shape.py:70)
  - homography: 3x3 whitespace text (test-graf/H1to6p, loaded with np.loadtxt)
"""

from __future__ import annotations

import numpy as np


def write_ells(path: str, ells: np.ndarray) -> None:
    """ells: (N, 5) rows x y a b c."""
    ells = np.asarray(ells)
    with open(path, "w") as f:
        f.write("1.0\n")
        f.write(f"{len(ells)}\n")
        for row in ells:
            f.write(" ".join(f"{v:10.10f}" for v in row) + "\n")


def read_ells(path: str) -> np.ndarray:
    with open(path) as f:
        lines = f.read().strip().splitlines()
    n = int(float(lines[1]))
    rows = [list(map(float, ln.split())) for ln in lines[2:2 + n]]
    return np.array(rows, np.float64)


def write_upright_affine(path: str, a_matrices: np.ndarray) -> None:
    """a_matrices: (N, 2, 2) upright (a12 == 0) -> rows 'a11 0 a21 a22'."""
    A = np.asarray(a_matrices)
    flat = np.stack([A[:, 0, 0], A[:, 0, 1], A[:, 1, 0], A[:, 1, 1]], axis=1)
    np.savetxt(path, flat, fmt="%10.5f")


def read_homography(path: str) -> np.ndarray:
    return np.loadtxt(path).astype(np.float64).reshape(3, 3)


def write_lafs_npy(path: str, lafs: np.ndarray) -> None:
    np.save(path, np.asarray(lafs))
