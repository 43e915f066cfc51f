from handmvnet_tpu.parallel.mesh import make_mesh  # noqa: F401
from handmvnet_tpu.parallel.view_parallel import (  # noqa: F401
    make_inference_mesh,
    make_replication_check,
    make_view_parallel_forward,
    view_data_sharding,
)
from handmvnet_tpu.parallel.train_step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_optimizer,
    make_lr_schedule,
    make_train_step,
    make_eval_step,
    resolve_remat,
)
