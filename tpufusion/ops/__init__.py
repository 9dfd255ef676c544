from tpufusion.ops.upfirdn2d import (
    blur,
    downsample_2x,
    make_blur_kernel,
    upfirdn2d,
    upsample_2x,
)
from tpufusion.ops.modconv import modulated_conv2d
from tpufusion.ops.adam_update import adam_init, fused_adam
from tpufusion.ops.pgd_update import pgd_update
from tpufusion.ops.composite import masked_composite
