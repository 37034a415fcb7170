from .wavenet_block import fused_residual_block  # noqa: F401
