from .base import Decoder, DecodeStats, decode, batchdecode
from .bp import BeliefPropagationDecoder
from .bitflip import BitFlipDecoder
from .bpots import BPOTSDecoder

__all__ = [
    "Decoder",
    "DecodeStats",
    "decode",
    "batchdecode",
    "BeliefPropagationDecoder",
    "BitFlipDecoder",
    "BPOTSDecoder",
]
