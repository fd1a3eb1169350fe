from . import featuremap
