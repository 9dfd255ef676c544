from tpufusion.fusion.drawer import DATASET_CONFIG, FusionDrawer, SWAP_TABLE
from tpufusion.fusion.spatial import ROLE_MAPS, n_inputs, spatial_fusion
from tpufusion.fusion.arithmetic import arithmetic_fusion
