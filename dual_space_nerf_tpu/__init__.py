"""Dual-Space NeRF, TPU-native.

A from-scratch JAX/XLA/Pallas re-implementation of the capabilities of
zyhbili/Dual-Space-NeRF ("Dual-Space NeRF: Learning Animatable Avatars and
Scene Lighting in Separate Spaces", 3DV 2022).

Layer map (mirrors SURVEY.md section 1, re-designed TPU-first):

- ``geometry``   pure-jnp ray/mesh math (barycentric warp, sampling, compositing)
- ``ops``        TPU kernels (Pallas nearest-face search, positional encoding)
- ``models``     Flax modules: SpaceNet, LightingMLP, PoseMLP, DualSpaceNeRF
- ``renderer``   jitted functional volume-rendering pipeline
- ``parallel``   jax.sharding mesh + ray-sharded train step
- ``data``       host-side numpy/cv2 pipeline (ZJU-MoCap, H36M, synthetic)
- ``training``   loss, optimizer/schedule, checkpointing, train loop
- ``evaluation`` PSNR/SSIM/LPIPS metrics, validation/test loops
- ``config``     yacs-compatible config tree + YAML merge
"""

__version__ = "0.1.0"
