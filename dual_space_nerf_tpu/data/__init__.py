from .batching import item_to_mesh, item_to_train_batch, iter_ray_chunks
from .prefetch import PrefetchLoader
from .select import load_yml_as_cfg, select_dataset
from .smpl import BodyModel, load_body_model, x_pose
from .synthetic import SyntheticScene, capsule_mesh, emission_color, make_scene
from .synthetic_dataset import SyntheticDataset

__all__ = [
    "item_to_mesh",
    "item_to_train_batch",
    "iter_ray_chunks",
    "PrefetchLoader",
    "load_yml_as_cfg",
    "select_dataset",
    "BodyModel",
    "load_body_model",
    "x_pose",
    "SyntheticScene",
    "capsule_mesh",
    "emission_color",
    "make_scene",
    "SyntheticDataset",
]
