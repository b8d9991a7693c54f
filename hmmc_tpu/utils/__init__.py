from hmmc_tpu.utils.file_utils import cached_path

__all__ = ["cached_path"]
