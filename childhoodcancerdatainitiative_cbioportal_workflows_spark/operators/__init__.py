from .interval_join import (  # noqa: F401
    derive_bin_size,
    interval_join,
    interval_join_bucketed,
    write_binned_bucketed,
)
from .dedup import keep_first, keep_topk, dedup_with_preference  # noqa: F401
from .pairing import pair_rows  # noqa: F401
from .pivot import to_wide_matrix, assert_unique_cells, wide_matrix_lines  # noqa: F401
from .reconcile import reconcile_counts  # noqa: F401
from .sketches import (  # noqa: F401
    approx_profile,
    bloom_build,
    bloom_merge,
    bloom_probe,
    hll_estimate,
    hll_estimate_grouped,
    hll_merge,
    hll_overlap,
    hll_sketch,
    hll_sketch_grouped,
)
from .skew import salted_aggregate, salted_join  # noqa: F401
from .asof import asof_join  # noqa: F401
from .resample import resample_locf  # noqa: F401
from .fuzzy import fuzzy_self_join  # noqa: F401
from .scd import scd2_intervals  # noqa: F401
from .graph import (  # noqa: F401
    kcore_peel,
    kcore_peel_sql,
    pagerank_fixed,
    pagerank_fixed_sql,
)
from .heavyhitters import heavy_hitters  # noqa: F401
from .bfs import bfs_hops  # noqa: F401
from .decay import decayed_scores  # noqa: F401
from .robust import grouped_low_median, mad_anomalies  # noqa: F401
from .neighborhood import sorted_neighborhood_pairs  # noqa: F401
from .neighborhood import sorted_neighborhood_multipass  # noqa: F401
from .bfs import sssp_hops  # noqa: F401
from .hierarchy import hierarchy_rollup, tree_roots  # noqa: F401
from .snapshot import snapshot_diff  # noqa: F401
from .lattice import (  # noqa: F401
    LatticeViolation,
    lattice_deviation,
    validate_lattice,
)
