"""Phred-scale probability conversions.

Semantics match the conversions used throughout the reference caller
(ADAM PhredUtils as used at e.g. /root/reference .../Likelihood.scala:48-50,
AlleleEvidence.scala:52): success probability = 1 - 10^(-phred/10), and
probability -> phred rounds -10*log10(error).
"""

from __future__ import annotations

import math

import numpy as np


def phred_to_error_probability(phred) -> float:
    return 10.0 ** (phred / -10.0)


def phred_to_success_probability(phred) -> float:
    """1 - 10^(-phred/10); vectorizes over numpy arrays."""
    if isinstance(phred, np.ndarray):
        return 1.0 - np.power(10.0, phred / -10.0)
    return 1.0 - 10.0 ** (phred / -10.0)


def error_probability_to_phred(prob: float) -> int:
    return int(round(-10.0 * math.log10(prob)))


def success_probability_to_phred(prob: float) -> int:
    """Phred-scale a success probability (callers subtract a small delta
    before calling this to avoid log(0), cf. AlleleEvidence.scala:52)."""
    return error_probability_to_phred(1.0 - prob)
