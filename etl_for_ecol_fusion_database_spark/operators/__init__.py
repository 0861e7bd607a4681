from . import (  # noqa: F401
    cdc,
    clustering,
    dedup,
    graph,
    history,
    joins,
    multimodal,
    sampling,
    similarity,
    skew,
    text,
    vectorized,
)
