from .components import (  # noqa: F401
    component_size_histogram,
    connected_components,
    connected_components_incremental,
    connected_components_stars,
)
from .labelprop import label_propagation, label_propagation_warm  # noqa: F401
from .pagerank import pagerank  # noqa: F401
from .triangles import (  # noqa: F401
    kclique_count,
    local_clustering,
    square_count,
    triangle_count,
    triangle_count_sampled,
    triangle_delta,
    triangles_per_vertex,
)
from .diameter import approximate_diameter, bfs_distances  # noqa: F401
from .hyperanf import hyperanf, hyperanf_register_moments  # noqa: F401
from .kcore import coreness  # noqa: F401
from .linkpred import link_suggestions  # noqa: F401
from .walks import node2vec_walks, random_walks  # noqa: F401
from .ppr import personalized_pagerank  # noqa: F401
from .summary import (  # noqa: F401
    degree_assortativity,
    degree_gini,
    global_clustering,
    rich_club,
)
from .betweenness import betweenness, edge_betweenness, girvan_newman_split  # noqa: F401
from .eigencentrality import eigenvector_centrality  # noqa: F401
from .hits import hits  # noqa: F401
from .closeness import effective_diameter, harmonic_closeness  # noqa: F401
from .densest import densest_subgraph_peel  # noqa: F401
from .scc import strongly_connected_components  # noqa: F401
from .wpagerank import weighted_pagerank  # noqa: F401
from .mis import maximal_independent_set  # noqa: F401
from .matching import coarsen_graph, maximal_matching  # noqa: F401
from .diff import degree_deltas, graph_diff  # noqa: F401
from .dpagerank import directed_pagerank, spam_mass, trustrank, warm_pagerank  # noqa: F401
from .coloring import greedy_coloring  # noqa: F401
from .butterflies import butterflies_per_vertex, butterfly_count  # noqa: F401
from .neighbor_sample import layerwise_neighbor_sample  # noqa: F401
from .louvain import contract_by_community, louvain, louvain_local_move  # noqa: F401
from .katz import katz_centrality  # noqa: F401
from .salsa import salsa_scores  # noqa: F401
from .wl import graph_fingerprint, wl_colors, wl_quotient  # noqa: F401
from .dag import topological_levels  # noqa: F401
from .bowtie import bowtie_classes  # noqa: F401
from .scc import scc_condensation  # noqa: F401
from .closeness import eccentricity_profile  # noqa: F401
from .labelspread import label_spreading  # noqa: F401
from .sweep import ppr_sweep_cut  # noqa: F401
from .census import dyad_census, triadic_census  # noqa: F401
from .onion import onion_decomposition  # noqa: F401
from .scan import scan_clusters  # noqa: F401
from .abcore import ab_core  # noqa: F401
from .graphlets import graphlet_census4  # noqa: F401
from .orbits import orbit_counts  # noqa: F401
from .twins import structural_twins  # noqa: F401
from .landmarks import landmark_distances, landmark_sketch, select_landmarks  # noqa: F401
from .rewire import configuration_rewire, triangle_significance  # noqa: F401
from .cascade import ic_influence, influence_max  # noqa: F401
from .simrank import simrank_mc  # noqa: F401
from .walks import walk_topk_recs  # noqa: F401
from .fuzzytwins import fuzzy_twins  # noqa: F401
from .percolation import percolation_summary, triangle_percolation  # noqa: F401
from .robustness import bond_percolation_profile, targeted_attack_profile  # noqa: F401
from .temporal import temporal_reachability  # noqa: F401
