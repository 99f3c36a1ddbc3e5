"""SPMD parallelism: device meshes and sharding rules.

The reference's only distributed strategy is single-host DDP over NCCL
(`nnunetv2/run/run_training.py:101-134`, SURVEY.md §2.3); here parallelism
is expressed as a `jax.sharding.Mesh` + `NamedSharding` annotations and XLA
GSPMD inserts the collectives (psum for gradient/loss reductions ≙ DDP
all-reduce; halo exchanges for spatially-sharded convs ≙ the reference's
z-split with 20-slice margins, `totalsegmentator/nnunet.py:483-505`).
"""

from boa_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    spatial_sharding,
)
