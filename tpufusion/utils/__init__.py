from tpufusion.utils.logging import EasyDict, Logger, StepTimer, trace_profile
from tpufusion.utils.resources import make_cache_dir_path, open_url, set_cache_dir
