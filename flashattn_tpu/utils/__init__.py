from . import datasets
from .checkpoint import restore_checkpoint, save_checkpoint
from .timing import KernelBench, device_loop_time
