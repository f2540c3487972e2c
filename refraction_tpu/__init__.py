"""refraction_tpu: a TPU-native ray-tracing framework (JAX/XLA/Pallas).

From-scratch reimplementation of the capabilities of the DXR demo
`bottledspace/refraction-raytracing-dxr` — OBJ/HDR asset ingest, an orbiting
pinhole camera, and recursive dielectric refraction with Fresnel-weighted
reflection shaded against an equirectangular environment map — with the
entire DXR hardware layer (acceleration structures, TraceRay, shader
scheduling) replaced by a software wavefront path tracer designed for TPU:
static-shape ray pools, Morton-clustered triangle culling, Pallas VPU
intersection kernels, and shard_map image sharding over device meshes.
"""

__version__ = "0.1.0"

from refraction_tpu.config import RenderConfig, baseline_config, reference_config  # noqa: F401
