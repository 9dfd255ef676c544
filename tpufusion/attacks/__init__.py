from tpufusion.attacks.pgd import PGDConfig, fgsm, make_pgd
from tpufusion.attacks.cw import CWConfig, make_cw
from tpufusion.attacks.whitebox import (
    LegacyOptimizeConfig,
    LossWeights,
    WhiteboxConfig,
    PRESET_ATTACK_MAIN,
    PRESET_INTERPOLATION,
    make_legacy_optimize,
    make_whitebox_attack,
)
from tpufusion.attacks.patch import (
    PatchConfig,
    apply_patch,
    circle_transform,
    init_patch_circle,
    init_patch_square,
    make_patch_attack_step,
    square_transform,
    submatrix,
    train_patch,
)
from tpufusion.attacks.baselines import (
    dp_noise,
    gaussian_blur_noise,
    out_domain_more,
    out_domain_single,
    paste_patch,
)
from tpufusion.attacks.hybrid import splice_hybrid
