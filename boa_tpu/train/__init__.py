"""Training subsystem: losses, optimizer, trainer loop (nnU-Net parity).

Parity targets: `nnunetv2/training/nnUNetTrainer/nnUNetTrainer.py:70-1387`,
`training/loss/{dice,compound_losses,robust_ce_loss,deep_supervision}.py`,
`training/lr_scheduler/polylr.py` — re-designed as pure functional JAX with
SPMD data/tensor parallelism instead of DDP(NCCL).
"""

from boa_tpu.train.losses import (  # noqa: F401
    dice_ce_loss,
    deep_supervision_loss,
    ds_weights,
    soft_dice_loss,
    softmax_ce_loss,
    topk_ce_loss,
)
from boa_tpu.train.optim import (  # noqa: F401
    init_sgd_state,
    poly_lr,
    sgd_nesterov_update,
)
from boa_tpu.train.trainer import (  # noqa: F401
    TrainConfig,
    TrainState,
    Trainer,
    make_train_step,
)
