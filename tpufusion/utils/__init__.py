from tpufusion.utils.logging import EasyDict, Logger, StepTimer, trace_profile
