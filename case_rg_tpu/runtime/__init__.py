from .inference import make_predict_fn
from .io import (ids_to_sentence, merge_shards, remove_duplicate,
                 save_results)
from .mesh import (batch_sharding, make_mesh, param_sharding_tree,
                   replicated, shard_batch)
from .profiling import MetricsLogger, StepMeter, trace
