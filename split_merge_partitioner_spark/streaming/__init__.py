from .edges_stream import streaming_degree_counts, streaming_edge_ingest  # noqa: F401
from .dedup_stream import (  # noqa: F401
    streaming_exact_dedup,
    streaming_vertex_degrees_stateful,
)
