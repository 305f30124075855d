from .partitioning import partition_params, shard_batch, param_pspecs
from .pipeline import PipeConfig, pipeline_blocks
