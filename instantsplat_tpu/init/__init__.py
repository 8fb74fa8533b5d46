from instantsplat_tpu.init.aligner import GlobalAligner, PairPrediction  # noqa: F401
from instantsplat_tpu.init.pairs import make_pair_indices  # noqa: F401
