"""Torch-checkpoint interop: torch-free .pkl reading + name/layout import.

torch (CPU build, baked into the image) is used ONLY as the save-side
oracle: it produces real ``torch.save`` artifacts and reference-layout
tensors; aide_tpu's reader must consume them with no torch at load time.
"""

import collections

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from aide_tpu.interop import load_torch_pickle, state_dict_to_variables
from aide_tpu.interop.torch_import import _build_name_map


# ------------------------- raw pickle round-trips -------------------------


def _sample_obj():
    sd = collections.OrderedDict()
    sd["conv.weight"] = torch.arange(24, dtype=torch.float32).reshape(2, 3, 2, 2)
    sd["conv.bias"] = torch.tensor([0.5, -1.5])
    sd["bn.running_mean"] = torch.randn(4, dtype=torch.float64)
    sd["bn.num_batches_tracked"] = torch.tensor(7)
    sd["half"] = torch.randn(3, 5).half()
    return {"net": sd, "epoch": 3, "loss": 0.25}


@pytest.mark.parametrize("zipfmt", [True, False], ids=["zip", "legacy"])
def test_load_torch_pickle_roundtrip(tmp_path, zipfmt):
    obj = _sample_obj()
    path = str(tmp_path / "ckpt.pkl")
    torch.save(obj, path, _use_new_zipfile_serialization=zipfmt)

    loaded = load_torch_pickle(path)
    assert loaded["epoch"] == 3 and loaded["loss"] == 0.25
    for name, tensor in obj["net"].items():
        got = loaded["net"][name]
        assert isinstance(got, np.ndarray), name
        np.testing.assert_array_equal(got, tensor.numpy(), err_msg=name)


def test_load_torch_pickle_noncontiguous_view(tmp_path):
    base = torch.arange(36, dtype=torch.float32).reshape(6, 6)
    obj = {"t": base.t()}  # transposed view: exercises stride handling
    path = str(tmp_path / "view.pkl")
    torch.save(obj, path)
    got = load_torch_pickle(path)["t"]
    np.testing.assert_array_equal(got, base.t().numpy())


def test_refuses_arbitrary_globals(tmp_path):
    """A malicious __reduce__ payload must be REFUSED, not executed: the
    legacy path parses untrusted pickles before the magic check, so the
    restricted unpickler has to stop the payload itself (calls recorded in
    ``fired`` prove non-execution, not just the raised error)."""
    import os
    import pickle

    path = str(tmp_path / "evil.pkl")
    marker = str(tmp_path / "pwned.marker")

    class Evil:
        def __reduce__(self):
            return (open, (marker, "w"))

    with open(path, "wb") as fh:
        pickle.dump({"net": Evil()}, fh)
    with pytest.raises(Exception):
        load_torch_pickle(path)
    assert not os.path.exists(marker), "malicious payload executed during load"


# --------------------- block-level numeric equivalence ---------------------


def _to_nhwc(x_torch):
    return np.transpose(x_torch.detach().numpy(), (0, 2, 3, 1))


def test_convblock_matches_torch_basic_block():
    """conv3x3+BN+ReLU x2 with imported weights reproduces torch exactly
    (eval mode, running stats)."""
    from aide_tpu.models.blocks import ConvBlock

    tconv1 = torch.nn.Conv2d(3, 6, 3, padding=1)
    tbn1 = torch.nn.BatchNorm2d(6)
    tconv2 = torch.nn.Conv2d(6, 6, 3, padding=1)
    tbn2 = torch.nn.BatchNorm2d(6)
    for bn in (tbn1, tbn2):
        bn.running_mean = torch.randn(6)
        bn.running_var = torch.rand(6) + 0.5
        bn.weight.data = torch.randn(6)
        bn.bias.data = torch.randn(6)
        bn.eval()

    sd = {
        "conv1.weight": tconv1.weight.detach().numpy(),
        "conv1.bias": tconv1.bias.detach().numpy(),
        "bn1.weight": tbn1.weight.detach().numpy(),
        "bn1.bias": tbn1.bias.detach().numpy(),
        "bn1.running_mean": tbn1.running_mean.numpy(),
        "bn1.running_var": tbn1.running_var.numpy(),
        "conv2.weight": tconv2.weight.detach().numpy(),
        "conv2.bias": tconv2.bias.detach().numpy(),
        "bn2.weight": tbn2.weight.detach().numpy(),
        "bn2.bias": tbn2.bias.detach().numpy(),
        "bn2.running_mean": tbn2.running_mean.numpy(),
        "bn2.running_var": tbn2.running_var.numpy(),
    }

    from aide_tpu.interop.torch_import import _conv_kernel

    variables = {
        "params": {
            "Conv_0": {"kernel": _conv_kernel(sd["conv1.weight"]),
                       "bias": sd["conv1.bias"]},
            "Norm_0": {"BatchNorm_0": {"scale": sd["bn1.weight"],
                                       "bias": sd["bn1.bias"]}},
            "Conv_1": {"kernel": _conv_kernel(sd["conv2.weight"]),
                       "bias": sd["conv2.bias"]},
            "Norm_1": {"BatchNorm_0": {"scale": sd["bn2.weight"],
                                       "bias": sd["bn2.bias"]}},
        },
        "batch_stats": {
            "Norm_0": {"BatchNorm_0": {"mean": sd["bn1.running_mean"],
                                       "var": sd["bn1.running_var"]}},
            "Norm_1": {"BatchNorm_0": {"mean": sd["bn2.running_mean"],
                                       "var": sd["bn2.running_var"]}},
        },
    }
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        t_out = torch.relu(tbn2(tconv2(torch.relu(tbn1(tconv1(x))))))

    block = ConvBlock(features=6, norm="batch", dtype=jnp.float32)
    j_out = block.apply(variables, jnp.asarray(_to_nhwc(x)), train=False)
    np.testing.assert_allclose(
        np.asarray(j_out), _to_nhwc(t_out), rtol=2e-5, atol=2e-5
    )


def test_conv_transpose_kernel_mapping():
    """ConvTranspose2d(k2,s2) weights map onto flax ConvTranspose exactly
    (the learned_bilinear upsample path)."""
    tconvT = torch.nn.ConvTranspose2d(4, 3, 2, stride=2)
    x = torch.randn(1, 4, 5, 5)
    with torch.no_grad():
        t_out = tconvT(x)

    from aide_tpu.interop.torch_import import _convT_kernel
    from flax import linen as nn

    m = nn.ConvTranspose(3, (2, 2), strides=(2, 2), dtype=jnp.float32)
    variables = {
        "params": {
            "kernel": jnp.asarray(_convT_kernel(tconvT.weight.detach().numpy())),
            "bias": jnp.asarray(tconvT.bias.detach().numpy()),
        }
    }
    j_out = m.apply(variables, jnp.asarray(_to_nhwc(x)))
    np.testing.assert_allclose(
        np.asarray(j_out), _to_nhwc(t_out), rtol=2e-5, atol=2e-5
    )


# ----------------------- full-model name-map import -----------------------


_INV_LAYOUT = {
    "conv": lambda hwio: np.transpose(hwio, (3, 2, 0, 1)),
    "convT": lambda k: np.transpose(k[::-1, ::-1], (2, 3, 0, 1)),
    "dense": lambda k: np.transpose(k, (1, 0)),
}


def _reference_state_dict(model, dummy, model_name, learned_bilinear=False):
    """Build a reference-named torch state_dict carrying OUR init values
    (inverse layout transforms), so the import must reproduce init exactly."""
    variables = model.init(jax.random.key(0), *dummy, train=False)
    name_map = _build_name_map(model_name, learned_bilinear)
    sd = collections.OrderedDict()

    def get(tree, path):
        for p in path:
            tree = tree[p]
        return tree

    for path, (theirs, kind) in name_map.items():
        if kind == "bn":
            p = get(variables["params"], path)
            s = get(variables["batch_stats"], path)
            sd[f"{theirs}.weight"] = torch.from_numpy(np.asarray(p["scale"]))
            sd[f"{theirs}.bias"] = torch.from_numpy(np.asarray(p["bias"]))
            sd[f"{theirs}.running_mean"] = torch.from_numpy(np.asarray(s["mean"]))
            sd[f"{theirs}.running_var"] = torch.from_numpy(np.asarray(s["var"]))
            sd[f"{theirs}.num_batches_tracked"] = torch.tensor(0)
        else:
            p = get(variables["params"], path)
            sd[f"{theirs}.weight"] = torch.from_numpy(
                np.ascontiguousarray(_INV_LAYOUT[kind](np.asarray(p["kernel"])))
            )
            sd[f"{theirs}.bias"] = torch.from_numpy(np.asarray(p["bias"]))
    return variables, sd


@pytest.mark.parametrize(
    "model_name,two_modal",
    [("fuseunet", True), ("unet2", False), ("unetsa", False)],
)
def test_import_reference_pkl_end_to_end(tmp_path, model_name, two_modal):
    from aide_tpu.core.config import ModelConfig
    from aide_tpu.interop import import_reference_checkpoint
    from aide_tpu.models import build_model

    cfg = ModelConfig(
        name=model_name, base_width=2, compute_dtype="float32", norm="batch"
    )
    model = build_model(cfg)
    x = jnp.zeros((1, 16, 16, 3))
    dummy = (x, x) if two_modal else (x,)
    variables, sd = _reference_state_dict(model, dummy, model_name)

    path = str(tmp_path / f"{model_name}.pkl")
    torch.save({"net": sd, "epoch": 5}, path)

    imported = import_reference_checkpoint(path, model_name)
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(imported)
    )
    assert len(flat_a) == len(flat_b)
    for k, v in flat_a:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_array_equal(np.asarray(v), flat_b[ks], err_msg=ks)

    # the imported variables drive the model
    out = model.apply(imported, *dummy, train=False)
    assert out.shape == (1, 16, 16, 2)


def test_import_reports_missing_keys(tmp_path):
    from aide_tpu.interop import import_reference_checkpoint

    sd = collections.OrderedDict(
        {"modal1_downblock1.block.conv1.weight": torch.zeros(2, 3, 3, 3)}
    )
    path = str(tmp_path / "bad.pkl")
    torch.save({"net": sd}, path)
    with pytest.raises(KeyError, match="missing"):
        import_reference_checkpoint(path, "fuseunet")


# ------------------------------- export -------------------------------


@pytest.mark.parametrize(
    "model_name,two_modal", [("unet4", False), ("fuseunet", True)]
)
def test_export_import_roundtrip(tmp_path, model_name, two_modal):
    """export_reference_checkpoint writes a torch-loadable .pkl that our
    torch-free importer maps back to the EXACT original variables."""
    from aide_tpu.core.config import ModelConfig
    from aide_tpu.interop import (
        export_reference_checkpoint,
        import_reference_checkpoint,
    )
    from aide_tpu.models import build_model

    cfg = ModelConfig(
        name=model_name, base_width=4, norm="batch", compute_dtype="float32"
    )
    model = build_model(cfg)
    x = jnp.zeros((1, 16, 16, 3))
    variables = model.init(
        jax.random.key(0), *((x, x) if two_modal else (x,)), train=False
    )
    variables = jax.tree_util.tree_map(np.asarray, variables)

    path = str(tmp_path / "exported.pkl")
    export_reference_checkpoint(
        path, variables, model_name, meta={"loss": 0.1, "epoch": 5}
    )

    # the reference's own loader consumes it
    obj = torch.load(path, weights_only=False)
    assert obj["epoch"] == 5 and "net" in obj

    back = import_reference_checkpoint(path, model_name)
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(back)
    }
    assert len(flat_a) == len(flat_b)
    for k, va in flat_a:
        vb = flat_b[jax.tree_util.keystr(k)]
        assert np.array_equal(np.asarray(va), np.asarray(vb)), k


def test_export_rejects_group_norm(tmp_path):
    from aide_tpu.core.config import ModelConfig
    from aide_tpu.interop import variables_to_state_dict
    from aide_tpu.models import build_model

    cfg = ModelConfig(
        name="unet4", base_width=4, norm="group", compute_dtype="float32"
    )
    model = build_model(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)), train=False)
    with pytest.raises(KeyError, match="norm='batch'"):
        variables_to_state_dict(variables, "unet4")


# ------------------------- serving artifacts -------------------------


def test_serving_artifact_roundtrip(tmp_path):
    """export_serving_artifact bakes one net's weights into a StableHLO
    function (symbolic batch) that deserializes WITHOUT model code and
    matches model.apply softmax at any batch size."""
    import jax
    import jax.numpy as jnp

    from aide_tpu.core.config import ModelConfig
    from aide_tpu.interop.serving import (
        export_serving_artifact,
        load_serving_artifact,
    )
    from aide_tpu.models import build_model

    model = build_model(
        ModelConfig(name="unet2", compute_dtype="float32", norm="group")
    )
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 3)), train=False
    )
    path = str(tmp_path / "unet2.serve")
    export_serving_artifact(
        path, model, variables, 16, two_modal=False, meta={"model": "unet2"}
    )

    call, header = load_serving_artifact(path)
    assert header["model"] == "unet2"
    assert header["img_size"] == 16

    rng = np.random.default_rng(0)
    for b in (1, 3):  # symbolic batch dimension
        x = rng.normal(size=(b, 16, 16, 3)).astype(np.float32)
        got = np.asarray(call(x))
        want = np.asarray(
            jax.nn.softmax(
                model.apply(variables, x, train=False).astype(jnp.float32),
                axis=-1,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-5)
        assert got.shape == (b, 16, 16, 2)


def test_serving_artifact_two_modal(tmp_path):
    import jax
    import jax.numpy as jnp

    from aide_tpu.core.config import ModelConfig
    from aide_tpu.interop.serving import (
        export_serving_artifact,
        load_serving_artifact,
    )
    from aide_tpu.models import build_model

    model = build_model(
        ModelConfig(name="fuseunet", base_width=2, compute_dtype="float32",
                    norm="group")
    )
    z = jnp.zeros((1, 16, 16, 3))
    variables = model.init(jax.random.key(0), z, z, train=False)
    path = str(tmp_path / "fuse.serve")
    export_serving_artifact(path, model, variables, 16, two_modal=True)

    call, header = load_serving_artifact(path)
    assert header["two_modal"] is True
    rng = np.random.default_rng(1)
    a = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    b = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    got = np.asarray(call(a, b))
    want = np.asarray(
        jax.nn.softmax(
            model.apply(variables, a, b, train=False).astype(jnp.float32),
            axis=-1,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_serving_artifact_bf16_weights(tmp_path):
    """weights_dtype='bfloat16' bakes bf16 weight constants: the artifact
    shrinks materially and the function output stays within one weight
    rounding of the float32 artifact."""
    import os

    import jax
    import jax.numpy as jnp

    from aide_tpu.core.config import ModelConfig
    from aide_tpu.interop.serving import (
        export_serving_artifact,
        load_serving_artifact,
    )
    from aide_tpu.models import build_model

    model = build_model(
        ModelConfig(name="unet2", compute_dtype="float32", norm="group")
    )
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 3)), train=False
    )
    # numpy-backed leaves = what checkpoint loading (flax from_bytes)
    # produces; numpy bf16 constants used to fold back to f32 during
    # tracing, silently exporting a full-size artifact
    variables = jax.tree_util.tree_map(np.asarray, variables)
    p32 = str(tmp_path / "w32.serve")
    p16 = str(tmp_path / "w16.serve")
    export_serving_artifact(p32, model, variables, 16, two_modal=False)
    export_serving_artifact(
        p16, model, variables, 16, two_modal=False,
        weights_dtype="bfloat16",
    )
    # the weights dominate the artifact; bf16 must cut it well below 3/4
    assert os.path.getsize(p16) < 0.75 * os.path.getsize(p32)

    call32, hdr32 = load_serving_artifact(p32)
    call16, hdr16 = load_serving_artifact(p16)
    assert hdr32["weights_dtype"] == "float32"
    assert hdr16["weights_dtype"] == "bfloat16"
    x = np.random.default_rng(2).normal(size=(2, 16, 16, 3)).astype(
        np.float32
    )
    want32 = np.asarray(call32(x))
    got = np.asarray(call16(x))
    assert got.dtype == np.float32 and got.shape == want32.shape
    # exact semantics: the artifact == model.apply with bf16-rounded weights
    bf16_vars = jax.tree_util.tree_map(
        lambda leaf: leaf.astype(jnp.bfloat16)
        if jnp.issubdtype(leaf.dtype, jnp.floating) else leaf,
        variables,
    )
    want16 = np.asarray(
        jax.nn.softmax(
            model.apply(bf16_vars, x, train=False).astype(jnp.float32),
            axis=-1,
        )
    )
    np.testing.assert_allclose(got, want16, atol=1e-5)
    # and the rounding stays a perturbation of the float32 output on
    # average (pointwise deviation can spike where logits are near-equal)
    assert float(np.abs(got - want32).mean()) < 5e-3
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)

    with pytest.raises(ValueError, match="weights_dtype"):
        export_serving_artifact(
            str(tmp_path / "bad.serve"), model, variables, 16,
            two_modal=False, weights_dtype="float16",
        )


def test_serving_artifact_rejects_foreign_file(tmp_path):
    from aide_tpu.interop.serving import load_serving_artifact

    p = tmp_path / "bogus.serve"
    p.write_bytes(b"not an artifact")
    with pytest.raises(ValueError, match="serving artifact"):
        load_serving_artifact(str(p))
