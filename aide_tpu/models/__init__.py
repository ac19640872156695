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


def build_eval_model(model_cfg):
    """Build the forward-only twin of ``build_model(model_cfg)``.

    Identical network and parameter pytree, but with the packed block
    barrier dropped: the barrier exists solely to fence an XLA TPU
    *backward*-fusion miscompile (models/packed.py BLOCK_BARRIER), so
    eval/predict/serving programs — which never differentiate — get
    nothing from it while paying its fusion cost in the big lax.map
    inference programs."""
    import dataclasses

    if getattr(model_cfg, "packed_block_barrier", False):
        model_cfg = dataclasses.replace(model_cfg, packed_block_barrier=False)
    return build_model(model_cfg)


def is_two_modal(name: str) -> bool:
    return name.startswith("fuseunet")
