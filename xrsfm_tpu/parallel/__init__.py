from .dist_ba import make_distributed_lm_step, shard_problem  # noqa: F401
