from . import datasets
from .checkpoint import (AsyncCheckpointManager, restore_checkpoint,
                         save_checkpoint)
from .debug import (
    assert_finite,
    check_2norm,
    checkify_errors,
    enable_nan_debugging,
    find_nonfinite,
    tensor_stats,
)
from .timing import KernelBench, device_loop_time
