"""Self-contained serving artifacts via ``jax.export`` (StableHLO).

The reference's deployment story is "load the .pkl in our eval script"
(/root/reference/train_files/evalchaos_comparison_1cases.py:154-157); a
production TPU serving path wants a framework-free artifact instead. Here
one network's weights are BAKED INTO an exported StableHLO function
(symbolic batch dimension, fixed image size), serialized with jax.export's
versioned format: any later JAX process — a serving binary, a different
accelerator build — can ``deserialize(...).call(images)`` without aide_tpu
installed or the model code present.

The exported function maps normalized NHWC float32 images (one or two
modalities) to fp32 class probabilities (B, H, W, C).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Tuple

import numpy as np


MAGIC = b"AIDETPU1"


def export_serving_artifact(
    path: str,
    model,
    variables: Dict,
    img_size: int,
    two_modal: bool,
    meta: Dict | None = None,
    weights_dtype: str = "float32",
) -> None:
    """Write ``path`` = MAGIC + u64 header length + JSON header + the
    serialized exported function.

    ``weights_dtype="bfloat16"`` rounds the baked-in floating weight leaves
    to bf16 before export, halving the artifact (the weights dominate its
    size) and the serving-time weight memory. The function signature is
    unchanged (float32 in, float32 probabilities out); mixed-precision
    promotion keeps the compute dtype what the model already uses, so the
    only deviation from the float32 artifact is one rounding of the weights.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    if weights_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"weights_dtype must be float32 or bfloat16, got {weights_dtype!r}"
        )
    if weights_dtype == "bfloat16":
        # The bf16 leaves must be JAX arrays, not numpy: flax promotes
        # params to the module compute dtype, and on a NUMPY bf16 leaf that
        # `.astype(float32)` runs EAGERLY during tracing — the baked
        # constant silently becomes full-size f32 (round-4 regression; the
        # artifact came out LARGER than f32). On a jax-array leaf the same
        # cast is traced, so the constant stays bf16 and the promotion is
        # one in-graph convert. Place the leaves on the host CPU backend
        # when one exists so export never pays the tunneled TPU backend's
        # ~0.25 s/transfer per leaf nor depends on chip availability.
        import ml_dtypes

        try:
            _host = jax.local_devices(backend="cpu")[0]
        except Exception:  # cpu platform masked (e.g. JAX_PLATFORMS=<tpu>)
            _host = None

        def _to_bf16(leaf):
            if not (
                hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
            ):
                return leaf
            arr = np.asarray(leaf).astype(ml_dtypes.bfloat16)
            return jnp.asarray(arr) if _host is None else jax.device_put(arr, _host)

        variables = jax.tree_util.tree_map(_to_bf16, variables)

    def serve(*images):
        logits = model.apply(variables, *images, train=False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    (b,) = jax_export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, img_size, img_size, 3), jnp.float32)
    args = (spec, spec) if two_modal else (spec,)
    # multi-platform lowering: a single-platform export refuses to run
    # anywhere but the backend it was traced on, which defeats "export on
    # the training host, serve elsewhere" (e.g. CLI exports run on CPU)
    platforms = ("cpu", "tpu", "cuda")
    exported = jax_export.export(jax.jit(serve), platforms=platforms)(*args)
    payload = exported.serialize()

    header = dict(meta or {})
    header.update(
        img_size=int(img_size),
        two_modal=bool(two_modal),
        input_dtype="float32",
        weights_dtype=weights_dtype,
        platforms=list(platforms),
        output="softmax probabilities (B, H, W, C), float32",
        jax_version=jax.__version__,
    )
    hdr = json.dumps(header).encode()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(MAGIC)
        fh.write(len(hdr).to_bytes(8, "little"))
        fh.write(hdr)
        fh.write(payload)
    os.replace(tmp, path)


def load_serving_artifact(path: str) -> Tuple[Callable[..., Any], Dict]:
    """(callable, header). The callable takes NHWC float32 image array(s)
    and returns fp32 probabilities — no aide_tpu model code involved."""
    from jax import export as jax_export

    with open(path, "rb") as fh:
        blob = fh.read()
    if not blob.startswith(MAGIC):
        raise ValueError(f"{path!r} is not an aide_tpu serving artifact")
    off = len(MAGIC)
    hlen = int.from_bytes(blob[off : off + 8], "little")
    off += 8
    header = json.loads(blob[off : off + hlen].decode())
    exported = jax_export.deserialize(blob[off + hlen :])
    return exported.call, header
