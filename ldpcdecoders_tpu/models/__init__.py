from .base import Decoder, DecodeStats, decode, batchdecode
from .bp import BeliefPropagationDecoder

__all__ = [
    "Decoder",
    "DecodeStats",
    "decode",
    "batchdecode",
    "BeliefPropagationDecoder",
]
