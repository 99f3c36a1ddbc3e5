from boa_tpu.inference.predictor import Predictor

__all__ = ["Predictor"]
