"""ZetaRay-TPU: a TPU-native real-time path-tracing framework.

A from-scratch rebuild of the capabilities of ZetaRay (a D3D12/DXR ReSTIR
path tracer, see /root/reference) designed TPU-first:

- DXR hardware BVH traversal -> dense MXU ray/triangle-cluster intersection
  (Woop unit-triangle transforms as matmuls) + host-built SAH BVH culling.
- HLSL compute passes -> fused JAX/Pallas kernels over SoA image arrays.
- The D3D12 render graph -> the dataflow graph of a single jitted frame fn.
- Multi-GPU-queue pipelining -> pjit/shard_map pixel-tile sharding over a
  device mesh with halo exchange for stencil passes.

Package layout:
  core/      math, sampling (alias tables, Halton), bit-packing
  scene/     glTF loader, flattened scene arrays, camera, materials
  accel/     BVH build (host) + intersection kernels (device)
  ops/       render passes: bsdf, lights, path tracer, ReSTIR, post
  parallel/  device-mesh sharding of the pixel grid
  render/    frame orchestration (the render-graph equivalent)
  utils/     config/params, stats, logging
"""

__version__ = "0.1.0"
