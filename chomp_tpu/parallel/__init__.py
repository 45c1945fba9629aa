from chomp_tpu.parallel.sweep import (
    broadcast_cosmo,
    make_pipeline,
    make_inference_step,
    sweep,
)

__all__ = ["broadcast_cosmo", "make_pipeline", "make_inference_step", "sweep"]
