"""Match re-scoring penalties.

Reference ``src/penaltystrategies/{defaultpenalty,exponentialpenalty}.cpp``.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class DefaultPenalty:
    """score' = score / max(len, 1e-6)  (``defaultpenalty.cpp:35-41``)."""

    def apply(self, score: np.ndarray, length: np.ndarray) -> np.ndarray:
        return score / np.maximum(length, np.float32(1e-6))


@dataclasses.dataclass(frozen=True)
class ExponentialPenalty:
    """score' = score / max(len, 1e-6)^tau  (``exponentialpenalty.cpp:39-45``)."""
    tau: float = 1.5

    def get_tau(self) -> float:
        return self.tau

    def apply(self, score: np.ndarray, length: np.ndarray) -> np.ndarray:
        return score / np.power(np.maximum(length, np.float32(1e-6)),
                                np.float32(self.tau))


def penalize(penalty, matches, template_lengths):
    """Apply a penalty to a list of matches; raises ``IndexError`` if a
    match's template index exceeds the lengths vector, mirroring the
    reference's ``std::out_of_range`` (``defaultpenalty.cpp:42-57``)."""
    lengths = np.asarray(template_lengths, np.float32)
    if not matches:
        return []
    idx = np.fromiter((m.tmpl_idx for m in matches), np.int64, len(matches))
    if idx.size and int(idx.max()) >= len(lengths):
        raise IndexError(
            "In penalize, the size of templatelengths is not consistent "
            "with match template indices")
    scores = np.fromiter((m.score for m in matches), np.float32, len(matches))
    new_scores = penalty.apply(scores, lengths[idx])
    return [type(m)(m.tmpl_idx, float(s), m.transform)
            for m, s in zip(matches, new_scores)]
