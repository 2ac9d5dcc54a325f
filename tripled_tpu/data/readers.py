"""Split-file readers.

The split lists (Eigen / eigen_full / odom / benchmark / ...) are *data*, not
code; they are consumed from an existing checkout (`TRIPLED_SPLITS_DIR` env
var or the read-only reference mount) rather than vendored.
"""

from __future__ import annotations

import os

def _split_dirs() -> tuple:
    # env read at call time so programs may set TRIPLED_SPLITS_DIR after
    # importing the package (e.g. fixture builders)
    return (
        os.environ.get("TRIPLED_SPLITS_DIR", ""),
        os.path.join(os.path.dirname(__file__), "splits"),
        "/root/reference/mono/datasets/splits",
    )


def readlines(path: str) -> list[str]:
    with open(path) as f:
        return [line.rstrip() for line in f if line.strip()]


def split_file_path(split: str, filename: str) -> str:
    """Resolve e.g. ('exp', 'train_files.txt') against known split roots."""
    for root in _split_dirs():
        if not root:
            continue
        p = os.path.join(root, split, filename)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(
        f"split file {split}/{filename} not found in {_split_dirs()}; "
        "set TRIPLED_SPLITS_DIR"
    )
