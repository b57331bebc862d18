from .numpy_ref import bp_decode, osd_postprocess, bitflip_decode, bpots_decode

__all__ = ["bp_decode", "osd_postprocess", "bitflip_decode", "bpots_decode"]
