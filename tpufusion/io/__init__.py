from tpufusion.io.images import load_image, save_image, save_montage
from tpufusion.io.artifacts import (
    ArtifactStore,
    new_adv_dir,
    new_run_folder,
    write_parameters,
)
from tpufusion.io.attack_state import (
    load_attack_state,
    run_whitebox_resumable,
    run_whitebox_sharded_resumable,
    save_attack_state,
)
from tpufusion.io.orbax_io import (
    restore_checkpoint,
    save_checkpoint,
)
from tpufusion.io.export import (
    export_decode,
    export_program,
    export_spatial_fusion,
    load_program,
)
from tpufusion.io.checkpoint import (
    convert_ada_discriminator,
    convert_e4e_checkpoint,
    convert_stylegan2_checkpoint,
    convert_vgg16_checkpoint,
    load_torch_state_dict,
)
