from .expr_partitioners import dbh_partition, hybrid_partition  # noqa: F401
from .fsm import FsmResult, fsm_partition  # noqa: F401
from .hdrf import hdrf_partition  # noqa: F401
from .stats import (  # noqa: F401
    degree_decade_histogram,
    partition_stats,
    replica_sets,
    validate_partition,
)
