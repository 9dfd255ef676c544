from tpufusion.data.dataset import (
    IMG_EXTENSIONS,
    BatchLoader,
    ImageFolderDataset,
    list_images,
    setup_loaders,
)
from tpufusion.data.transforms import (
    DATASET_REGISTRY,
    TransformConfig,
    transform_for,
)
from tpufusion.data.alignment import align_face, FFHQ_LANDMARK_SLICES
