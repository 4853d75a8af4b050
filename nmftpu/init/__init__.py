"""Factor initialization strategies (SURVEY.md C8): the reference's six
strategies — CopyExisting, AllRandomValues, MeanColumns, and the three
k-means-seeded variants — rebuilt as jitted JAX functions."""

from nmftpu.init.strategies import initialize_factors
from nmftpu.init.kmeans import kmeans_columns

__all__ = ["initialize_factors", "kmeans_columns"]
