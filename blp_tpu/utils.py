"""Small shared utilities."""

from __future__ import annotations

import logging

import numpy as np


def make_ent2idx(entities: np.ndarray, max_ent_id: int) -> np.ndarray:
    """Entity id -> position among `entities`; -1 for holes
    (reference: utils.py:31-43)."""
    ent2idx = np.full(max_ent_id + 1, -1, np.int64)
    ent2idx[entities] = np.arange(len(entities))
    return ent2idx


def get_logger(name: str = "blp_tpu") -> logging.Logger:
    """Timestamped stdout logger (reference: utils.py:171-183)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        ch = logging.StreamHandler()
        fmt = logging.Formatter(
            "%(asctime)s - %(levelname)s - %(name)s - %(message)s", datefmt="%H:%M:%S")
        ch.setFormatter(fmt)
        logger.addHandler(ch)
        logger.setLevel("INFO")
        logger.propagate = False
    return logger
