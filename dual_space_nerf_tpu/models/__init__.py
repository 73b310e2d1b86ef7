from .spacenet import DualSpaceNeRF, LightingMLP, PoseMLP, SpaceNet, rod2quat

__all__ = ["DualSpaceNeRF", "LightingMLP", "PoseMLP", "SpaceNet", "rod2quat"]
