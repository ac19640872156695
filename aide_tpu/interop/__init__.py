"""Interop with the reference's artifact formats (torch-pickled checkpoints).

``torch_pickle``: torch-free reader for ``torch.save`` files (both the
zip-container and legacy streaming formats) returning NumPy arrays.
``torch_import``: name/layout mapping from reference ``state_dict``s
(NCHW/OIHW torch) into aide_tpu Flax variable trees (NHWC/HWIO).
``torch_export``: the inverse — write reference-loadable ``.pkl``
checkpoints from aide_tpu variables (needs the torch CPU wheel).
"""

from aide_tpu.interop.torch_pickle import load_torch_pickle
from aide_tpu.interop.torch_import import (
    import_reference_checkpoint,
    state_dict_to_variables,
)
from aide_tpu.interop.torch_export import (
    export_reference_checkpoint,
    variables_to_state_dict,
)
