from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    seq_batch_sharding,
    shard_batch_seq,
)
from .step import (
    TrainState,
    build_optimizer,
    make_micro_grads,
    make_train_step,
    make_eval_step,
    sample_out_of_group,
    set_learning_rate,
    current_learning_rate,
)
from . import multihost
