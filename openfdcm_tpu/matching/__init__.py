from . import featuremap, search, optimize, penalty, match
