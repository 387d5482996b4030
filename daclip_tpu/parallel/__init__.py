from daclip_tpu.parallel.mesh import (fsdp_param_shardings,
                                      initialize_distributed, make_mesh,
                                      make_mesh_for_batch, mesh_from_spec,
                                      replicate_tree, shard_batch)

__all__ = ["make_mesh", "make_mesh_for_batch", "mesh_from_spec",
           "replicate_tree", "shard_batch", "fsdp_param_shardings",
           "initialize_distributed"]
