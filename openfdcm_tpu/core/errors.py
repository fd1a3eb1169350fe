"""Error types mirroring the reference (``core/error.h:32-50``).

Like the reference, the hot compute paths never raise — failures are encoded
as values (NaN / inf scores, invalid-candidate masks, ``None`` optimal
translations); these exceptions appear only at API edges (serialization
format errors, penalty index checks).
"""


class OpenFDCMError(Exception):
    """Base class for openfdcm_tpu errors."""


class PointOutOfBound(OpenFDCMError):
    """A point lies outside the feature map (reference ``error.h:34-40``)."""


class ImgProcError(OpenFDCMError):
    """Image-processing failure (reference ``error.h:42-48``)."""
