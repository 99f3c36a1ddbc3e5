from boa_tpu.plans.plans import ModelPlans, synthetic_plans

__all__ = ["ModelPlans", "synthetic_plans"]
