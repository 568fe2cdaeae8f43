from .run import run, run_mesh, PipelineResult
from .batch import run_batch, BatchItem
