"""Interop with the reference's artifact formats (torch-pickled checkpoints).

``torch_pickle``: torch-free reader for ``torch.save`` files (both the
zip-container and legacy streaming formats) returning NumPy arrays.
``torch_import``: name/layout mapping from reference ``state_dict``s
(NCHW/OIHW torch) into aide_tpu Flax variable trees (NHWC/HWIO).
"""

from aide_tpu.interop.torch_pickle import load_torch_pickle
from aide_tpu.interop.torch_import import (
    import_reference_checkpoint,
    state_dict_to_variables,
)
