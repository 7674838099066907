from redshells_spark.multimodal.binary_ops import (
    attach_binary_metadata,
    decode_images,
    extract_image_features,
    sample_video_frames,
)

__all__ = [
    "attach_binary_metadata",
    "decode_images",
    "extract_image_features",
    "sample_video_frames",
]
