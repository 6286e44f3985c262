from .audio import decode_wav, logmel, mel_filterbank, n_frames_for, synth_wav
from .decode import (
    AudioFeatureStage,
    FrameSampleStage,
    encode_npv,
    ImageDecodeStage,
    ImageResizeStage,
)

__all__ = [
    "AudioFeatureStage",
    "FrameSampleStage",
    "decode_wav",
    "encode_npv",
    "logmel",
    "mel_filterbank",
    "n_frames_for",
    "synth_wav",
    "ImageDecodeStage",
    "ImageResizeStage",
]
