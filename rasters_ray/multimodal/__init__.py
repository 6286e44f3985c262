from .decode import (
    AudioFeatureStage,
    FrameSampleStage,
    ImageDecodeStage,
    ImageResizeStage,
)

__all__ = [
    "AudioFeatureStage",
    "FrameSampleStage",
    "ImageDecodeStage",
    "ImageResizeStage",
]
