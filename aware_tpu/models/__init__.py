from aware_tpu.models.detector import (
    DetectorParams,
    load_key_params,
    init_params,
    detector_apply,
    detector_apply_batch,
    preprocess_magnitude,
    detect_values,
    model_info,
)

__all__ = [
    "DetectorParams",
    "load_key_params",
    "init_params",
    "detector_apply",
    "detector_apply_batch",
    "preprocess_magnitude",
    "detect_values",
    "model_info",
]
