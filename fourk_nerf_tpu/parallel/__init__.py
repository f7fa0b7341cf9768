"""Parallelism layer: device meshes, shardings, and distributed helpers.

The reference is single-GPU with a dormant NCCL stack
(/root/reference/torch_utils/distributed_utils.py, SURVEY.md section 2.3). The
TPU-native scaling axes are: ray batches (data parallel), the voxel grid
(spatially sharded "tensor parallel" for >HBM volumes), and SR image tiles
(sequence/context-parallel analogue). All expressed as `jax.sharding` over a
single Mesh; XLA inserts the ICI collectives.
"""

from fourk_nerf_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    shard_grid_params,
    all_reduce_dict,
    is_master,
)
