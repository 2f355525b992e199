from aware_tpu.service.api import (
    AWAREEmbedder,
    AWAREDetector,
    load,
    embed_watermark,
    detect_watermark,
    embed_watermark_batch,
    detect_watermark_batch,
)
from aware_tpu.service.codec import encode_pattern, decode_pattern
from aware_tpu.service.ecc import (
    decode_message,
    decode_message_windows,
    detect_message,
    detect_message_robust,
    embed_message,
    encode_message,
)
from aware_tpu.service.robust import detect_watermark_robust
from aware_tpu.service.fast import embed_watermark_oneshot, embed_watermark_turbo
from aware_tpu.service.streaming import (
    StreamingDetector,
    StreamingResult,
    detect_watermark_streaming,
)

__all__ = [
    "detect_watermark_robust",
    "embed_watermark_oneshot",
    "embed_watermark_turbo",
    "AWAREEmbedder",
    "AWAREDetector",
    "load",
    "embed_watermark",
    "detect_watermark",
    "embed_watermark_batch",
    "detect_watermark_batch",
    "encode_pattern",
    "decode_pattern",
    "encode_message",
    "decode_message",
    "decode_message_windows",
    "embed_message",
    "detect_message",
    "detect_message_robust",
    "StreamingDetector",
    "StreamingResult",
    "detect_watermark_streaming",
]
