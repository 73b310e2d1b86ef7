from .nearest_face import (
    face_centroids,
    nearest_face,
    nearest_face_pallas,
    nearest_face_xla,
)
from .posenc import posenc, posenc_dim

__all__ = [
    "face_centroids",
    "nearest_face",
    "nearest_face_pallas",
    "nearest_face_xla",
    "posenc",
    "posenc_dim",
]
