"""CLI end-to-end tests (train -> eval -> predict on the synthetic preset)."""

import json
import os

import numpy as np
import pytest

from aide_tpu.cli.main import main


@pytest.mark.slow
def test_train_eval_predict_cycle(tmp_path, capsys):
    work = str(tmp_path)
    common = [
        "--preset", "synthetic_supervised",
        "--set",
        f"data.root={work}/data",
        f"checkpoint_dir={work}/ckpt",
        f"history_dir={work}/hist",
        "data.img_size=32",
        "model.name=unet2",
        # batch norm so the export step below maps onto the reference's
        # BatchNorm checkpoint layout (export refuses group norm)
        "model.norm=batch",
        "num_epochs=1",
    ]
    assert main(["train"] + common + ["--epochs", "1"]) == 0
    ckpts = [f for f in os.listdir(f"{work}/ckpt") if f.endswith(".msgpack")]
    assert any("besttraincasedice" in f for f in ckpts)
    ckpt = os.path.join(
        f"{work}/ckpt",
        next(f for f in ckpts if "besttraincasedice" in f and "json" not in f),
    )

    assert (
        main(
            ["eval"] + common + ["--checkpoint", ckpt, "--output", f"{work}/evalout"]
        )
        == 0
    )
    csvs = [f for f in os.listdir(f"{work}/evalout") if f.endswith(".csv")]
    assert len(csvs) == 1
    with open(os.path.join(f"{work}/evalout", csvs[0])) as fh:
        header = fh.readline().strip()
    assert header == "Patient_case,Dice,IoU,TP,TN,FP,FN"

    assert (
        main(
            ["predict"] + common + ["--checkpoint", ckpt, "--output", f"{work}/pred"]
        )
        == 0
    )
    assert os.path.isdir(f"{work}/pred")
    assert any(os.listdir(f"{work}/pred"))

    # export: the CLI writes a torch-loadable .pkl in the reference layout
    assert (
        main(
            ["export"] + common + ["--checkpoint", ckpt, "--output", f"{work}/net.pkl"]
        )
        == 0
    )
    import torch

    obj = torch.load(f"{work}/net.pkl", weights_only=False)
    assert "net" in obj and "epoch" in obj

    # export --format serve: a framework-free StableHLO artifact; bf16
    # weights must shrink it vs the float32 export
    for dtype, out in (("float32", "f32.serve"), ("bfloat16", "bf16.serve")):
        assert (
            main(
                ["export"] + common
                + ["--checkpoint", ckpt, "--output", f"{work}/{out}",
                   "--format", "serve", "--weights-dtype", dtype]
            )
            == 0
        )
    sz32 = os.path.getsize(f"{work}/f32.serve")
    sz16 = os.path.getsize(f"{work}/bf16.serve")
    assert sz16 < 0.75 * sz32, (sz16, sz32)
    from aide_tpu.interop.serving import load_serving_artifact

    call, header = load_serving_artifact(f"{work}/bf16.serve")
    assert header["weights_dtype"] == "bfloat16"
    assert "cpu" in header["platforms"] and "tpu" in header["platforms"]
    probs = np.asarray(call(np.zeros((2, 32, 32, 3), np.float32)))
    assert probs.shape == (2, 32, 32, 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_eval_requires_checkpoint(tmp_path):
    rc = main(
        [
            "eval", "--preset", "synthetic_supervised",
            "--set", f"data.root={tmp_path}/d", "data.img_size=32",
            "model.name=unet2",
        ]
    )
    assert rc == 2


def test_repeated_set_flags_all_apply():
    """`--set a=1 --set b=2` must apply BOTH groups: argparse nargs="*"
    without action="append" silently kept only the last --set flag."""
    import argparse

    from aide_tpu.cli.main import _build_config

    ns = argparse.Namespace(
        config=None, preset="synthetic_supervised", data_root=".",
        set=[["num_epochs=7"], ["data.img_size=48"]],
    )
    cfg = _build_config(ns)
    assert cfg.num_epochs == 7
    assert cfg.data.img_size == 48


def test_presets_command(capsys):
    assert main(["presets"]) == 0
    out = capsys.readouterr().out
    assert "chaos_proposed_30cases1labeled" in out
