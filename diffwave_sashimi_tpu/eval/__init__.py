"""Sample-quality evaluation: FID / Inception Score for SC09 (the paper's
metric, arXiv:2202.09729 via reference README.md:2; not present in the
reference repo) plus the scoring classifier and CLI."""

from .fid import frechet_distance, gaussian_stats, inception_score

__all__ = ["frechet_distance", "gaussian_stats", "inception_score"]
