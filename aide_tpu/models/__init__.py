from aide_tpu.models.unet import UNet  # noqa: F401
from aide_tpu.models.fuseunet import FuseUNet  # noqa: F401
from aide_tpu.models import blocks  # noqa: F401
from aide_tpu.core.registry import MODELS  # noqa: F401


def build_model(model_cfg):
    """Build a model from ModelConfig via the registry (replaces the
    per-script build_model functions, e.g.
    /root/reference/train_files/trainchaos_proposed_30cases1labeled.py:74-79).
    """
    return MODELS.get(model_cfg.name)(model_cfg)


def is_two_modal(name: str) -> bool:
    return name.startswith("fuseunet")
