"""openfdcm_tpu: a TPU-native Fast Directional Chamfer Matching framework.

Re-implements the full capability surface of Innoptech/OpenFDCM with a
JAX/XLA compute path designed TPU-first: the DT3 feature bank is one dense
``[depth, H, W]`` tensor built with batched seed-min distance transforms and
shear-cumsum line integrals; candidate generation, alignment, and the greedy
1D optimizers all run as lockstep batched device code.

Public API mirrors the reference's Python module
(``modules/python/src/matching.cpp:62-307``, ``core.cpp:39-50``); see
:mod:`openfdcm_tpu.compat` for a drop-in ``import openfdcm`` shim.
"""
from .core.types import Distance
from .core import geometry, io, utils
from .core.errors import OpenFDCMError, PointOutOfBound, ImgProcError
from .core.io import read, write
from .core.geometry import get_template_lengths
from .matching.featuremap import (
    Dt3Params, Dt3Featuremap, build_featuremap, evaluate, minmax_translation,
    save_featuremap, load_featuremap,
)
from . import profiling
from .matching.search import (
    DefaultSearch, ConcentricRangeStrategy, establish_search_strategy,
)
from .matching.optimize import (
    DefaultOptimize, IndulgentOptimize, BatchOptimize, DenseOptimize, optimize,
)
from .matching.penalty import DefaultPenalty, ExponentialPenalty, penalize
from .matching.match import (
    Match, DefaultMatch, search, sort_matches, TemplateBank, prepare_templates,
)
from .matching.pipeline import (
    Dt3FeaturemapBatch, build_featuremap_batch, search_batch, match_many,
    match_many_async,
)
from .sweep import resumable_sweep, SweepState
from .serving import MatcherService

# Reference spells the enum `openfdcm.distance`.
distance = Distance

__version__ = "0.1.0"
# Reference exposes OPENFDCM_VER_{MAJOR,MINOR,PATCH} (core/version.h.in:28-32).
version_info = tuple(int(p) for p in __version__.split("."))

__all__ = [
    "Distance", "distance", "read", "write", "get_template_lengths",
    "Dt3Params", "Dt3Featuremap", "build_featuremap", "evaluate",
    "save_featuremap", "load_featuremap", "profiling",
    "minmax_translation", "DefaultSearch", "ConcentricRangeStrategy",
    "establish_search_strategy", "DefaultOptimize", "IndulgentOptimize",
    "BatchOptimize", "DenseOptimize", "optimize", "DefaultPenalty",
    "ExponentialPenalty", "penalize", "Match", "DefaultMatch", "search",
    "sort_matches", "TemplateBank", "prepare_templates", "geometry", "io",
    "Dt3FeaturemapBatch", "build_featuremap_batch", "search_batch", "match_many",
    "match_many_async",
    "resumable_sweep", "SweepState", "MatcherService",
    "OpenFDCMError", "PointOutOfBound", "ImgProcError", "utils",
    "enable_compilation_cache", "ensure_backend",
]


def ensure_backend(timeout_s: float = 240.0) -> str:
    """Probe the accelerator backend in a SUBPROCESS and fall back to CPU
    if it is unreachable.

    A dead remote-attached TPU (e.g. a hung relay) blocks ``jax.devices()``
    forever in-process; probing in a child process bounds the wait.  Call
    BEFORE any other JAX use.  Returns the backend name ("tpu", "cpu", or
    "cpu-fallback" when an accelerator was configured but unreachable).
    """
    import subprocess
    import sys as _sys
    import jax
    # Already pinned to CPU in-process (tests, docs builds): nothing to
    # probe — the subprocess would inherit the accelerator env and pay the
    # full timeout on a dead relay.
    if jax.config.jax_platforms == "cpu":
        return "cpu"
    try:
        r = subprocess.run(
            [_sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "import sys; sys.exit(0 if d[0].platform != 'cpu' else 3)"],
            timeout=timeout_s, capture_output=True)
        if r.returncode == 0:
            return "tpu"
        if r.returncode == 3:
            return "cpu"
    except (subprocess.TimeoutExpired, OSError):
        pass
    jax.config.update("jax_platforms", "cpu")
    return "cpu-fallback"


def enable_compilation_cache(path: str | None = None,
                             min_compile_secs: float = 0.5) -> None:
    """Enable JAX's persistent compilation cache (huge win on
    remote-attached TPUs where each XLA compile pays tunnel latency).

    ``path`` defaults to ``$OPENFDCM_TPU_CACHE`` if set, else a per-user
    cache directory (``~/.cache/openfdcm_tpu/jax_cache``).
    """
    import os
    import jax
    if path is None:
        path = os.environ.get("OPENFDCM_TPU_CACHE") or os.path.join(
            os.environ.get("XDG_CACHE_HOME")
            or os.path.expanduser("~/.cache"), "openfdcm_tpu", "jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
