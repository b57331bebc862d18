"""Shared numeric clamp constants for LLR-domain tanh-rule decoders.

Single source of truth for the reference's stability clamps
(bpots_decoder.jl:185-208): tanh values clamped to +/-TANH_CLAMP,
messages to +/-MSG_CLAMP.  (The golden NumPy transcription keeps its own
literals on purpose — it is a standalone oracle.)
"""

TANH_CLAMP = 0.99999
MSG_CLAMP = 100.0
