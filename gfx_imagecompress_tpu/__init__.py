"""gfx_imagecompress_tpu — TPU-native BCn texture block compression.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
DeanoC/gfx_imagecompress (BC1-BC7 encode), built TPU-first: batched block
tensors, compute-all + masked-argmin searches, halo-free multi-chip sharding
(see SURVEY.md at the repo root for the full design rationale).
"""

from .api import (compress, compress_amd_bc1, compress_amd_bc2,
                  compress_amd_bc3, compress_amd_bc4, compress_amd_bc5,
                  compress_amd_bc6h, compress_amd_bc7, compress_chunked,
                  compress_richgel999_bc7, pick_compression_type)
from .formats import BlockFormat, CompressType, PickFlags
from .image import CompressedImage, Image
from .options import (AMDBackendOptions, BC1Options, BC6HOptions, BC7Options,
                      RichGel999Options)

__version__ = "0.1.0"

__all__ = [
    "compress", "compress_chunked", "pick_compression_type",
    "compress_amd_bc1", "compress_amd_bc2", "compress_amd_bc3",
    "compress_amd_bc4", "compress_amd_bc5", "compress_amd_bc6h",
    "compress_amd_bc7", "compress_richgel999_bc7",
    "CompressType", "PickFlags", "BlockFormat",
    "Image", "CompressedImage",
    "AMDBackendOptions", "BC1Options", "BC6HOptions", "BC7Options",
    "RichGel999Options",
]
