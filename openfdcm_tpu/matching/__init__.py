"""Matching layer: the five extension points of the reference, as plain
Python protocols (the reference implements each as a manual type-erasure
stack — tag base + concept + virtual model + pimpl wrapper, e.g.
``matching/featuremap.h:11-124``; duck typing replaces all of it):

* **feature maps** — objects with ``get_feature_size`` / ``evaluate`` /
  ``minmax_translation`` semantics (:class:`featuremap.Dt3Featuremap`),
* **match strategies** — orchestration (:class:`match.DefaultMatch`),
* **search strategies** — candidate pair generation: anything accepted by
  :func:`search.establish_search_strategy`,
* **optimize strategies** — 1D translation optimizers recognized by
  :func:`optimize.optimizer_mode` (Default/Indulgent/Batch/Dense),
* **penalty strategies** — objects with ``apply(scores, lengths)``
  (:mod:`penalty`).
"""
from . import featuremap, match, optimize, penalty, pipeline, search  # noqa: F401
