from tpufusion.parallel.sharding import (
    batch_sharding,
    create_mesh,
    expected_tp_leaf_count,
    make_sharded_group_fusion_attack,
    make_sharded_patch_train_step,
    make_sharded_whitebox_step,
    pad_batch_to_multiple,
    replicate,
    run_whitebox_sharded,
    shard_generator_params,
    train_patch_sharded,
)
