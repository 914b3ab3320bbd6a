from slak_tpu.ops.depthwise import depthwise_conv2d, large_kernel_conv
from slak_tpu.ops.batchnorm import batch_norm

__all__ = ["depthwise_conv2d", "large_kernel_conv", "batch_norm"]
