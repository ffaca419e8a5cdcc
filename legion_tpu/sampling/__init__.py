from legion_tpu.sampling.block import Block, SampledBatch, frontier_caps  # noqa: F401
from legion_tpu.sampling.sampler import DeviceGraph, sample_batch, sample_neighbors  # noqa: F401
from legion_tpu.sampling.seeds import SeedPlan, make_seed_plan  # noqa: F401
