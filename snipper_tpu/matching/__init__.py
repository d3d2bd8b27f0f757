from snipper_tpu.matching.matcher import (  # noqa: F401
    cost_matrix,
    hungarian,
    hungarian_scipy,
    match,
)
