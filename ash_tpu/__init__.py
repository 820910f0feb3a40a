"""ash_tpu — a TPU-native real-time software renderer.

A ground-up JAX/Pallas rebuild of the capabilities of the Vulkan renderer
`saptak7777/Ash-Renderer` (mounted read-only at /root/reference). The scene API
(`Mesh`/`Material`/`Transform`/`Camera`, handle registries,
`Renderer.render_frame(view, proj, camera_pos)`) is preserved; the GPU pipeline
is re-designed TPU-first:

- vertex/index/instance buffers, textures and framebuffers are HBM-resident
  jnp arrays; the vertex stage is a batched matmul (MXU);
- the graphics pipeline is a tile-binned software rasterizer producing a
  visibility buffer, shaded by a deferred PBR pass (Pallas/XLA kernels);
- the compute passes (Hi-Z, occlusion culling, Forward+ light culling) are
  vectorized reductions/scans — no atomics, no shared memory;
- the post chain (bloom, ACES tonemap, TAA) is a fused image pipeline;
- fences/semaphores/swapchains are replaced by JAX async dispatch; "resize"
  re-specializes the jitted frame function per extent.

Prelude mirrors the reference's `ash_renderer::prelude` (src/lib.rs:43).
"""

from .core import (
    MVP,
    Camera,
    Material,
    MaterialDescriptor,
    MaterialProperties,
    MaterialUniform,
    Mesh,
    MeshDescriptor,
    MvpMatrices,
    TextureData,
    Transform,
    VertexArrays,
)
from .errors import AshError, SwapchainOutOfDate

__version__ = "0.1.0"

__all__ = [
    "MVP",
    "Camera",
    "Material",
    "MaterialDescriptor",
    "MaterialProperties",
    "MaterialUniform",
    "Mesh",
    "MeshDescriptor",
    "MvpMatrices",
    "TextureData",
    "Transform",
    "VertexArrays",
    "AshError",
    "SwapchainOutOfDate",
    "__version__",
]


def __getattr__(name):
    # Renderer imports jax; keep `import ash_tpu` light for pure-math users.
    if name in (
        "Renderer",
        "RendererConfig",
        "HeadlessSurface",
        "FileStreamSurface",
        "LiveViewSurface",
        "RenderCommand",
        "SurfaceProvider",
    ):
        from . import render

        return getattr(render, name)
    raise AttributeError(f"module 'ash_tpu' has no attribute {name!r}")
