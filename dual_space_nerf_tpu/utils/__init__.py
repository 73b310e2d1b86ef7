from .logger import make_summary_writer, setup_logger
from .mesh_extract import marching_tetrahedra, save_obj

__all__ = [
    "make_summary_writer",
    "setup_logger",
    "marching_tetrahedra",
    "save_obj",
]
