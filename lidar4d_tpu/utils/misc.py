"""Misc utilities: seeding (utils/misc.py:7-15 parity, minus cudnn knobs)."""

import os
import random

import numpy as np


def set_seed(seed: int):
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)
    # JAX randomness is explicit (PRNG keys derived from this seed by callers);
    # XLA compilation is deterministic, so nothing else to pin.
