from aide_tpu.data.pipeline import SlicePipeline, LabelStore  # noqa: F401
from aide_tpu.data.tasks.base import SliceSpec, Task  # noqa: F401
from aide_tpu.data.tasks import chaos, prostate, kidney, breast, synthetic  # noqa: F401
from aide_tpu.core.registry import TASKS  # noqa: F401
