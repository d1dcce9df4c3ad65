from webgraph_rs_spark.algorithms.pagerank import pagerank  # noqa: F401
from webgraph_rs_spark.algorithms.components import (  # noqa: F401
    connected_components,
    cc_star,
    component_sizes,
    renumber_by_size,
)
from webgraph_rs_spark.algorithms.labelprop import label_propagation  # noqa: F401
from webgraph_rs_spark.algorithms.triangles import (  # noqa: F401
    triangle_count,
    triangles_per_vertex,
)
from webgraph_rs_spark.algorithms.bfs import (  # noqa: F401
    bfs_distances,
    bfs_order,
    bfs_tree,
)
from webgraph_rs_spark.algorithms.sccs import (  # noqa: F401
    strongly_connected_components,
    condensation,
)
from webgraph_rs_spark.algorithms.topsort import (  # noqa: F401
    topological_levels,
    is_acyclic,
)
from webgraph_rs_spark.algorithms.birank import birank  # noqa: F401
from webgraph_rs_spark.algorithms.distances import (  # noqa: F401
    all_pairs_distances,
    eccentricities,
    exact_sum_sweep,
    geometric_centralities,
    hyperball,
    neighborhood_function,
    radius_diameter,
)
from webgraph_rs_spark.algorithms.llp import llp, labels_to_ranks, gap_cost  # noqa: F401
