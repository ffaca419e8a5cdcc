from legion_tpu.cache.hotness import presample_hotness  # noqa: F401
from legion_tpu.cache.cost_model import CachePlanResult, solve_cost_model  # noqa: F401
from legion_tpu.cache.feature_cache import FeatureCache  # noqa: F401
from legion_tpu.cache.topo_cache import TopoCache  # noqa: F401
