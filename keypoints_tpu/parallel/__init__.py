from keypoints_tpu.parallel.dp import (data_parallel_mesh, make_dp_extract,
                                       make_dp_fused_chunk,
                                       make_dp_train_step, replicate,
                                       shard_batch)

__all__ = ["data_parallel_mesh", "make_dp_extract", "make_dp_fused_chunk",
           "make_dp_train_step", "replicate", "shard_batch"]
