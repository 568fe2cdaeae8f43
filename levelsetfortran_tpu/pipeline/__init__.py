from .run import run, run_mesh, PipelineResult
