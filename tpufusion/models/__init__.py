from tpufusion.models.stylegan2 import Generator, GeneratorOutput, create_generator
from tpufusion.models.vgg16 import VGG16, create_vgg16, perceptual_distance
from tpufusion.models.lpips import LPIPS, create_lpips, load_torch_lpips
from tpufusion.models.vit import ViTClassifier, convert_vit_checkpoint, create_vit
from tpufusion.models.e4e import Encoder4Editing, create_encoder, get_latents
from tpufusion.models.fusion_hierarchy import (
    HierarchyBlender,
    get_all_active_parts,
    TREES,
)
from tpufusion.models.landmarks import (
    LandmarkNet,
    load_packaged_landmark_net,
    make_landmark_provider,
    packaged_landmark_provider,
)
from tpufusion.models.resnet import ResNet, convert_resnet18_checkpoint, create_resnet18
from tpufusion.models.discriminator import (
    Discriminator,
    create_discriminator,
    realism_scores,
)
