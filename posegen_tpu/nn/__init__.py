from posegen_tpu.nn.layers import (  # noqa: F401
    init_linear,
    linear,
    init_batchnorm,
    batchnorm,
    init_conv,
    conv2d,
    max_pool,
    leaky_relu,
)
