from .base import DATA_DIR, EXPECTATION_FNS, Distribution, rejection_sampling, sample_uniform  # noqa: F401
