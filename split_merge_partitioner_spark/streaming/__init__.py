from .edges_stream import (  # noqa: F401
    streaming_dbh_router,
    streaming_degree_counts,
    streaming_edge_ingest,
)
from .dedup_stream import (  # noqa: F401
    streaming_exact_dedup,
    streaming_vertex_degrees_stateful,
)
from .sessions_stream import streaming_sessionize  # noqa: F401
from .enrich_stream import streaming_recent_meta_join  # noqa: F401
from .transitions_stream import streaming_transitions  # noqa: F401
from .cusum_stream import streaming_cusum  # noqa: F401
from .regularity_stream import streaming_gap_regularity  # noqa: F401
from .triangles_stream import (  # noqa: F401
    streaming_triangle_maintenance,
    triangle_maintenance_sink,
)
