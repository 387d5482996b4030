from daclip_tpu.parallel.mesh import (make_mesh, replicate_tree, shard_batch,
                                      fsdp_param_shardings)

__all__ = ["make_mesh", "replicate_tree", "shard_batch", "fsdp_param_shardings"]
