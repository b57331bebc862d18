from .base import decode_soft, Decoder, DecodeStats, decode, batchdecode
from .bp import BeliefPropagationDecoder
from .bitflip import BitFlipDecoder
from .bpots import BPOTSDecoder
from .bposd import BeliefPropagationOSDDecoder
from .minsum import MinSumDecoder
from .minsum_q import QuantizedMinSumDecoder
from .layered import LayeredMinSumDecoder
from .bucketed import BucketedDecoder
from .css import CSSDecoder
from .qc_minsum import QCMinSumDecoder
from .peeling import ErasurePeelingDecoder
from .mixed import MixedChannelDecoder
from .neural import NeuralMinSumDecoder
from .spacetime import SpaceTimeDecoder
from .window import SlidingWindowDecoder
from .detector import DetectorGraphDecoder, load_dem
from .ensemble import EnsembleDecoder
from .staged import StagedDemDecoder
from .demwindow import WindowedDemDecoder

__all__ = [
    "Decoder",
    "DecodeStats",
    "decode",
    "batchdecode",
    "BeliefPropagationDecoder",
    "BeliefPropagationOSDDecoder",
    "BitFlipDecoder",
    "BPOTSDecoder",
    "MinSumDecoder",
    "QuantizedMinSumDecoder",
    "LayeredMinSumDecoder",
    "BucketedDecoder",
    "CSSDecoder",
    "QCMinSumDecoder",
    "ErasurePeelingDecoder",
    "MixedChannelDecoder",
    "NeuralMinSumDecoder",
    "SpaceTimeDecoder",
    "SlidingWindowDecoder",
    "DetectorGraphDecoder",
    "EnsembleDecoder",
    "StagedDemDecoder",
    "WindowedDemDecoder",
    "load_dem",
    "decode_soft",
]
