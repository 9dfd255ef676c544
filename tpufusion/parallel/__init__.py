from tpufusion.parallel.sharding import (
    batch_sharding,
    create_mesh,
    make_sharded_group_fusion_attack,
    make_sharded_patch_train_step,
    make_sharded_whitebox_step,
    replicate,
    shard_generator_params,
)
