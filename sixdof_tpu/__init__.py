"""sixdof_tpu — a TPU-native 6-DoF pose-estimation + defect-projection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`ziadabohalawa/6DoF-Pose-Estimation-and-Defect-Projection` (reference mounted at
/root/reference): FoundationPose-style render-and-compare pose estimation
(refiner + scorer networks on a batched crop-space rasterizer), point-to-plane
ICP refinement, 2D-heatmap→3D-mesh defect ray tracing, and a live 3-D defect
viewer — all designed TPU-first:

- every hot op (raster, ICP, ray trace, depth filters, crop warps, networks) is
  a jitted XLA program with static shapes; Pallas kernels cover the
  bandwidth-bound stencils;
- host↔device traffic is one upload per frame; the whole frame step runs
  on-device;
- hypothesis/ray axes shard over a `jax.sharding.Mesh` for multi-chip.

Layout (mirrors the reference's layer map, SURVEY.md §1):
  ops/       device kernels: geometry, lie, rasterize, icp, raytrace, filters
  models/    RefineNet / ScoreNetMultiPair (flax) + predictors + converter
  parallel/  device-mesh sharding + training step
  io/        mesh & scene IO, readers (offline/live)
  app/       run loop, defect projection, web viewer
  utils/     logging, colormaps, drawing
"""

__version__ = "0.1.0"
