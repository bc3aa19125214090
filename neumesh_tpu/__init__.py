"""neumesh_tpu — a TPU-native (JAX/XLA/Pallas) neural implicit-surface NVS +
editing framework with the capabilities of zju3dv/NeuMesh.

Pipeline (mirrors reference README.md:40-51):
  1. train a NeuS teacher (SDF MLP + radiance MLP) from multi-view images,
  2. extract a triangle mesh via marching cubes,
  3. distill a NeuMesh student with disentangled per-vertex geometry/texture
     codes decoded by two small MLPs,
  4. render novel views,
  5. edit: geometry deformation, texture swapping/filling/painting.

Design (TPU-first, not a port):
  - models are pytrees of f32 arrays + pure apply functions; the model
    protocol (sdf / sdf_with_grad / rgb / s) feeds a single jitted
    volume-rendering program with static shapes,
  - kNN over mesh vertices runs on-device (uniform-grid counting-sort
    structure; XLA gather path + Pallas fused kernel),
  - multi-chip scaling via jax.sharding.Mesh + shard_map over the ray axis,
  - host-side geometry tooling (marching cubes, KD-tree, BVH ray casting,
    ARAP) in C++ with ctypes bindings and numpy fallbacks.
"""

__version__ = "0.1.0"
