"""Pure, deterministic kernels — the byte-identical semantic contract."""
