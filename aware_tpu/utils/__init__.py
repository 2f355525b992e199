from aware_tpu.utils.logger import logger

__all__ = ["logger"]
