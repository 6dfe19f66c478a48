"""Model zoo: native Flax 3D-CNNs + Keras-h5 importer + registry."""
from .densenet import DenseNet3D, densecpd, densenet  # noqa: F401
from .keras_import import KerasH5Model, load_keras_model  # noqa: F401
from .layers import ConvBlock, global_average_pool_3d, spatial_dropout_3d  # noqa: F401
from .prodconn import ProDCoNN, prodconn  # noqa: F401
from .registry import MODEL_REGISTRY, ModelSpec, get_model_spec, load_model  # noqa: F401
from .timed import (  # noqa: F401
    TIMED,
    timed,
    timed_deep,
    timed_rotamer,
    timed_rotamer_deep,
    timed_rotamer_not_so_deep,
)
from .keras_export import export_timed_to_h5  # noqa: F401
