from .scalars import epoch_ms_to_ts, array_cost_sum  # noqa: F401
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
