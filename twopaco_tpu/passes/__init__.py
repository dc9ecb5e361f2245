from twopaco_tpu.passes.pipeline import (
    Enumerator,
    PipelineConfig,
    build_junctions,
    INVALID_VERTEX,
)
