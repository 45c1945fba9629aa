from chomp_tpu.ops.fftlog_pallas import hankel_matmul_pallas  # noqa: F401
