"""Scalar / link-prediction / vector-similarity functions
(the @UserFunction surface, SURVEY.md §2.5)."""

from .scalar import (  # noqa: F401
    as_node,
    infinity,
    is_finite,
    is_infinite,
    nan,
    node_property,
    version,
)
from .similarity import (  # noqa: F401
    cosine,
    euclidean,
    euclidean_distance,
    jaccard,
    overlap,
    pearson,
)
from .linkprediction import (  # noqa: F401
    adamic_adar_pairs,
    common_neighbors_pairs,
    preferential_attachment_pairs,
    resource_allocation_pairs,
    same_community_pairs,
    total_neighbors_pairs,
)
