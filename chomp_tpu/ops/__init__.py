from chomp_tpu.ops.fftlog_pallas import hankel_matmul_pallas  # noqa: F401
from chomp_tpu.ops.halo_pallas import fused_contractions  # noqa: F401
