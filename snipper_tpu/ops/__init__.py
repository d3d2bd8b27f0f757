from snipper_tpu.ops.deform_attn import (  # noqa: F401
    ms_deform_attn_core,
    temporal_adjacency,
    temporal_deform_sample,
)
