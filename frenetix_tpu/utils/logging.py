"""Message logging: file + Rich console handlers.

Mirrors the reference's `logger_initialization`
(cr_scenario_handler/utils/multiagent_logging.py:289-335): one module logger
with a plain-text file handler and a Rich console handler.
"""
from __future__ import annotations

import logging
import os

__all__ = ["make_msg_logger"]


def make_msg_logger(log_dir: str, name: str = "frenetix_tpu", level=logging.INFO):
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(level)
    logger.propagate = False

    os.makedirs(log_dir, exist_ok=True)
    fh = logging.FileHandler(os.path.join(log_dir, "messages.log"))
    fh.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)-8s %(message)s", "%H:%M:%S")
    )
    logger.addHandler(fh)

    try:
        from rich.logging import RichHandler

        logger.addHandler(RichHandler(show_path=False))
    except ImportError:
        sh = logging.StreamHandler()
        sh.setFormatter(logging.Formatter("%(levelname)-8s %(message)s"))
        logger.addHandler(sh)
    return logger
