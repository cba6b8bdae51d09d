from .edges_stream import streaming_degree_counts, streaming_edge_ingest  # noqa: F401
