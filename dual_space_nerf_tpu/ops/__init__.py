from .clustered_knn import (
    FaceClusters,
    build_face_clusters,
    nearest_face_clustered,
)
from .nearest_face import (
    face_centroids,
    nearest_face,
    nearest_face_pallas,
    nearest_face_xla,
)
from .posenc import posenc, posenc_dim

__all__ = [
    "FaceClusters",
    "build_face_clusters",
    "nearest_face_clustered",
    "face_centroids",
    "nearest_face",
    "nearest_face_pallas",
    "nearest_face_xla",
    "posenc",
    "posenc_dim",
]
