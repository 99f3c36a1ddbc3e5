from boa_tpu.models.unet import (
    ArchConfig,
    init_unet,
    unet_forward,
    arch_config_from_plans,
)

__all__ = ["ArchConfig", "init_unet", "unet_forward", "arch_config_from_plans"]
