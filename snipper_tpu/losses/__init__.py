from snipper_tpu.losses.criterion import SetCriterion, loss_weight_dict  # noqa: F401
