from aide_tpu.data.tasks.base import SliceSpec, Task  # noqa: F401
