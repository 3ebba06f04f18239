"""lidar4d-tpu: TPU-native dynamic neural fields for space-time LiDAR view synthesis.

A from-scratch JAX / XLA / Pallas framework with the full capabilities of
LiDAR4D (CVPR 2024, reference implementation: ispc-lab/LiDAR4D). The compute
path is pure functional JAX (jit / shard_map / pallas); parameters are pytrees;
training shards ray batches across a TPU mesh over ICI.

Subpackages
-----------
ops       geometry + numeric kernels (hash encoding, chamfer, grid sample, pano)
models    neural fields (hash / planes / flow), LiDAR4D composition, renderer, U-Net
train     losses, optimizer, EMA, checkpointing, Trainer orchestration
data      KITTI-360 dataset + preprocessing, synthetic scenes
eval      metric meters (depth / intensity / raydrop / points)
sim       novel space-time LiDAR simulator
parallel  device mesh + sharded training step
cli       command-line entry points (train / simulate / preprocess)
"""

__version__ = "0.1.0"
