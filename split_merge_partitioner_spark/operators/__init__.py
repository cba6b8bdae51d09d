from .bpart import bpart_partition  # noqa: F401
from .ebv import ebv_partition  # noqa: F401
from .expr_partitioners import (  # noqa: F401
    dbh_partition,
    grid_partition,
    hybrid_partition,
    random_partition,
)
from .fennel import fennel_partition  # noqa: F401
from .hybridbl import hybridbl_partition  # noqa: F401
from .fsm import FsmResult, fsm_partition  # noqa: F401
from .hdrf import hdrf_partition  # noqa: F401
from .hep import hep_partition  # noqa: F401
from .ne import ne_partition  # noqa: F401
from .stats import (  # noqa: F401
    compare_partitioners,
    core_boundary_stats,
    degree_decade_histogram,
    partition_stats,
    replica_sets,
    replication_by_degree_decade,
    validate_partition,
)
from .vertex_cut import (  # noqa: F401
    vertex2edge_partition,
    vertex2edge_partition_ksplit,
    vertex_partition_by_hash,
    vertex_partition_stats,
)
from .multilevel import multilevel_partition  # noqa: F401
from .incremental import incremental_edge_assign  # noqa: F401
