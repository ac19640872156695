from aide_tpu.cli.main import main  # noqa: F401
from aide_tpu.cli.presets import PRESETS, get_preset  # noqa: F401
