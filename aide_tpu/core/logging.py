"""Console + file logging, mirroring the reference's setup
(/root/reference/train_files/trainchaos_proposed_30cases1labeled.py:598-604)
plus a structured parameter dump (record_params, :64-72)."""

from __future__ import annotations

import logging
import os
import time


def setup_logging(history_dir: str, experiment_name: str) -> logging.Logger:
    os.makedirs(history_dir, exist_ok=True)
    log_path = os.path.join(history_dir, f"{experiment_name}.log")
    logger = logging.getLogger("aide_tpu")
    logger.setLevel(logging.INFO)
    for h in logger.handlers:
        # close before dropping: repeated Trainer construction in one
        # process (sweeps, tests) must not leak a FileHandler fd per run
        h.close()
    logger.handlers.clear()
    fmt = logging.Formatter("%(message)s")
    for h in (logging.StreamHandler(), logging.FileHandler(log_path)):
        h.setFormatter(fmt)
        logger.addHandler(h)
    logger.propagate = False
    return logger


def record_params(logger: logging.Logger, config) -> None:
    logger.info("aide_tpu run ({})".format(time.asctime()))
    logger.info("**************Parameters***************")
    for line in config.to_json(indent=2).splitlines():
        logger.info(line)
    logger.info("**************Parameters***************\n")
