from .types import Distance, F32_MAX
from . import geometry, rasterize, draw, dt, integral, io
