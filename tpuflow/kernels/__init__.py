from tpuflow.kernels.jnp_ref import (
    compute_gradients,
    lucas_kanade_from_gradients,
    warp_image,
    upsample_flow,
    build_gaussian_pyramid,
)

__all__ = [
    "compute_gradients",
    "lucas_kanade_from_gradients",
    "warp_image",
    "upsample_flow",
    "build_gaussian_pyramid",
]
