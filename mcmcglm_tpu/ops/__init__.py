from .slice_kernels import (
    SLICE_KERNELS,
    SliceKernel,
    SliceResult,
    get_slice_kernel,
    register_slice_kernel,
    slice_doubling,
    slice_elliptical,
    slice_genelliptical,
    slice_latent,
    slice_stepping_out,
)
