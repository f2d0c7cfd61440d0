from fog_spark.algos.pagerank import (  # noqa: F401
    FogPageRank,
    FogPageRankMilli,
    PPRMilli,
    StandardPageRank,
    WeightedPageRankMilli,
    TrustRankMilli,
    WarmStartPageRank,
)
from fog_spark.algos.katz import KatzMilli  # noqa: F401
from fog_spark.algos.salsa import salsa_milli  # noqa: F401
from fog_spark.algos.spam import UniformPageRankMilli, spam_mass_milli  # noqa: F401
from fog_spark.algos.bowtie import bowtie, bowtie_census  # noqa: F401
from fog_spark.algos.components import ConnectedComponents, WarmStartCC  # noqa: F401
from fog_spark.algos.kcore import coreness, k_core  # noqa: F401
from fog_spark.algos.ktruss import k_truss  # noqa: F401
from fog_spark.algos.lpa import LabelPropagation  # noqa: F401
from fog_spark.algos.traversal import BFS, SSSP  # noqa: F401
from fog_spark.algos.mis import maximal_independent_set  # noqa: F401
from fog_spark.algos.msf import msf, msf_total_weight  # noqa: F401
from fog_spark.algos.hits import hits_milli  # noqa: F401
from fog_spark.algos.hyperball import (  # noqa: F401
    HyperBall,
    effective_diameter,
    hyperball_sketches,
    neighborhood_function,
)
from fog_spark.algos.modularity import modularity_plus1_milli, modularity_terms  # noqa: F401
from fog_spark.algos.msbfs import (  # noqa: F401
    betweenness_sampled,
    ego_network,
    harmonic_centrality_milli,
    multi_source_bfs,
    shortest_path_counts,
    sp_continuations,
)
from fog_spark.algos.reach import AnchorReach, anchor_reachability  # noqa: F401
from fog_spark.algos.scc import scc, scc_sizes  # noqa: F401
from fog_spark.algos.spmv import spmv  # noqa: F401
from fog_spark.algos.triangles import triangle_count, triangles  # noqa: F401
