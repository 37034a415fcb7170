from .diffwave import diffwave_loss, make_diffwave_train_step, wavenet_param_sharding  # noqa: F401
