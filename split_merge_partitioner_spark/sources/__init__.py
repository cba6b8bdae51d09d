from .edges import (  # noqa: F401
    bipartite_project,
    canonicalize_edges,
    cochange_edges,
    degrees,
    edges_from_lineitem,
    edges_from_repos,
    renumber_edges,
    vertices_of,
)
from .repos import make_repos_df, repos_pandas  # noqa: F401
from .rmat import rmat_edges  # noqa: F401
from .synthetic import (  # noqa: F401
    powerlaw_edges_pdf,
    tiny_graph_pdf,
    zipf_config_edges_pdf,
)
