from hmmc_tpu.data.framepack import FramePackReader, FramePackWriter
from hmmc_tpu.data.sampling import dynamic_frame_count, sample_frame_indices

__all__ = [
    "FramePackReader", "FramePackWriter", "sample_frame_indices",
    "dynamic_frame_count",
]
