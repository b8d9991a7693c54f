"""HMMC-TPU: TPU-native bilingual text-video retrieval framework.

See README.md for the architecture map and SURVEY.md for the reference
analysis this build follows.
"""

from hmmc_tpu.config import (ClipArch, CrossConfig, TaskConfig,
                             load_cross_config)

__version__ = "0.2.0"

__all__ = ["ClipArch", "CrossConfig", "TaskConfig", "load_cross_config",
           "__version__"]
