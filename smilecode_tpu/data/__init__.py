from smilecode_tpu.data.datasets import (
    LPBABrainDatasetS2S,
    LPBABrainInferDatasetS2S,
    LPBABrainHalfDatasetS2S,
    LPBABrainHalfInferDatasetS2S,
    LPBABrainAtlasDataset,
    LPBABrainAtlasInferDataset,
    pkload,
)
from smilecode_tpu.data.trans import Base, Seg_norm, NumpyType, Compose
from smilecode_tpu.data.loader import Loader

__all__ = [
    "LPBABrainDatasetS2S",
    "LPBABrainInferDatasetS2S",
    "LPBABrainHalfDatasetS2S",
    "LPBABrainHalfInferDatasetS2S",
    "LPBABrainAtlasDataset",
    "LPBABrainAtlasInferDataset",
    "pkload",
    "Base",
    "Seg_norm",
    "NumpyType",
    "Compose",
    "Loader",
]
