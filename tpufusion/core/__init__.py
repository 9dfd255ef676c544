from tpufusion.core.dtypes import Policy, default_policy, set_default_policy
from tpufusion.core.imaging import (
    avg_pool,
    clamp_pm1,
    montage,
    resize_bilinear,
    to_uint8,
    from_uint8,
)
from tpufusion.core.prng import PRNGPool, seed_everything
