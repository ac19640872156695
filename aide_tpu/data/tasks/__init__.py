from aide_tpu.data.tasks.base import SliceSpec, Task  # noqa: F401


def build_task(cfg) -> Task:
    """Construct the task a TrainConfig names — the single factory used by
    the Trainer and every CLI command (replaces per-script dataset wiring in
    the reference's train_files/*.py __main__ blocks).

    ``synthetic`` gets its generator defaults filled from the config;
    for every task ``data.task_options`` entries are forwarded to the task
    constructor verbatim (and win over the defaults).
    """
    import aide_tpu.data  # noqa: F401  (imports task modules -> registers)
    from aide_tpu.core.registry import TASKS

    if cfg.data.task == "synthetic":
        from aide_tpu.data.tasks.synthetic import SyntheticTask

        kw = dict(
            root=cfg.data.root or "./synthetic_data",
            tempmask_folder=cfg.data.tempmask_folder or "tempmasks",
            noisy_fraction=0.5,
            num_classes=cfg.model.num_classes,
            seed=cfg.seed,
        )
        kw.update(cfg.data.task_options)
        return SyntheticTask(**kw)
    return TASKS.get(cfg.data.task)(
        root=cfg.data.root,
        tempmask_folder=cfg.data.tempmask_folder,
        mask_identity=cfg.data.mask_identity,
        **cfg.data.task_options,
    )
