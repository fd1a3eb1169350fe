"""Drop-in ``import openfdcm`` shim for code written against the reference
library (Innoptech/OpenFDCM).  See :mod:`openfdcm_tpu.compat`."""
from openfdcm_tpu.compat import *          # noqa: F401,F403
from openfdcm_tpu.compat import distance   # noqa: F401
from openfdcm_tpu import __version__       # noqa: F401
