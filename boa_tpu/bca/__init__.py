from boa_tpu.bca.definitions import BodyPart, BodyRegion, Tissue

__all__ = ["BodyPart", "BodyRegion", "Tissue"]
