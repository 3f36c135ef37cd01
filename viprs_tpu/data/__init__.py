from .simulate import simulate_sumstats_blocks  # noqa: F401
