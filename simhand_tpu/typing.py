"""Semantic array aliases (reference: src/types.py)."""
from typing import NewType

import numpy as np

JOINTS_25D = NewType("JOINTS_25D", np.ndarray)   # (21, 3): u, v, scale-norm z
JOINTS_3D = NewType("JOINTS_3D", np.ndarray)     # (21, 3) camera space
CAMERA_PARAM = NewType("CAMERA_PARAM", np.ndarray)  # (3, 3) intrinsics
SCALE = NewType("SCALE", float)                  # wrist->index_mcp bone length
