from snipper_tpu.models.snipper import Snipper, build_model  # noqa: F401
