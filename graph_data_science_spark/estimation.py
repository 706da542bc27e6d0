"""Per-algorithm memory estimation (gds.*.estimate parity).

The reference builds a composable tree of per-component memory ranges
(core/.../mem/MemoryEstimations.java:167-290; each algorithm factory
contributes its own tree, e.g. PageRankAlgorithmFactory.memoryEstimation,
LouvainFactory, NodeSimilarityFactory). This module re-expresses those
trees for the Spark execution model: the dominant terms here are

- per-vertex state shipped through the superstep shuffle (the fused
  kernel ships dense per-bucket blobs: doubles × n),
- per-edge message traffic per superstep (bucket-local int32 id +
  float64 value = 12 B/edge for reducing messengers),
- the memory-mapped CSR block files (shared page-cache, one copy/host),
- operator-specific intermediates (wedge rows, per-source state, walk
  corpora).

Estimates are cluster-wide totals; divide by executor count for the
per-executor share. Spark spills to disk, so — exactly like the
reference's estimation mode — this is a planning aid, not an admission
gate. Ranges are (min, max): min assumes perfect convergence-frontier
shrink / no skew, max assumes every vertex active and the documented
worst-case intermediates.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .graph import Graph

KB, MB, GB = 1024, 1024**2, 1024**3


@dataclass
class MemoryTree:
    """Mirrors the reference's MemoryEstimations tree node."""

    name: str
    min_bytes: int
    max_bytes: int
    children: list["MemoryTree"] = field(default_factory=list)

    def render(self, indent: int = 0) -> str:
        lines = [
            "%s%s: [%s ... %s]"
            % (" " * indent, self.name, _human(self.min_bytes),
               _human(self.max_bytes))
        ]
        for c in self.children:
            lines.append(c.render(indent + 2))
        return "\n".join(lines)


def _human(b: int) -> str:
    for unit, size in (("GiB", GB), ("MiB", MB), ("KiB", KB)):
        if b >= size:
            return f"{b / size:.1f} {unit}"
    return f"{b} B"


def _tree(name: str, parts: list[tuple[str, int, int]]) -> MemoryTree:
    kids = [MemoryTree(n, lo, hi) for n, lo, hi in parts]
    return MemoryTree(
        name,
        sum(k.min_bytes for k in kids),
        sum(k.max_bytes for k in kids),
        kids,
    )


# per-edge bytes of one reducing-messenger superstep in the fused kernel
# (bucket-local int32 id + float64 payload)
_MSG = 12
# CSR block bytes per edge (dst-major: src_idx int32 + dst id amortized)
# + per-vertex offsets
_CSR_EDGE = 14
_ID = 8


def _csr(n: int, m: int) -> tuple[str, int, int]:
    return ("csr blocks (mmap, one page-cache copy per host)",
            m * _CSR_EDGE + n * _ID, m * _CSR_EDGE + 2 * n * _ID)


def _estimators() -> dict:
    def pagerank(n, m, c):
        return _tree("pagerank", [
            ("vertex state (rank, delta, degree doubles)", 3 * 8 * n, 3 * 8 * n),
            ("superstep messages", 0, m * _MSG),
            _csr(n, m),
        ])

    def wcc(n, m, c):
        return _tree("wcc", [
            ("component labels", 8 * n, 8 * n),
            ("frontier + min-label messages", 0, m * _MSG),
            ("pointer-jumping join", 2 * 8 * n, 4 * 8 * n),
        ])

    def kcore(n, m, c):
        return _tree("kcore", [
            ("core values (current + next)", 2 * 8 * n, 2 * 8 * n),
            ("symmetrized simple edges", 2 * m * 16, 2 * m * 16),
            ("neighbor-value rows per round", 0, 2 * m * _MSG),
        ])

    def label_propagation(n, m, c):
        return _tree("label_propagation", [
            ("labels + seeds", 2 * 8 * n, 2 * 8 * n),
            ("neighbor-label shuffle (struct-argmax)", m * 16, m * 24),
        ])

    def triangle_count(n, m, c):
        # degree-ordered orientation halves the edge set; the wedge join
        # materializes one row per wedge — bounded by sum deg(v)^2 over
        # the oriented graph, which degree-ordering caps near m^1.5 on
        # power-law graphs (max column) but is ~m on bounded-degree (min)
        import math
        return _tree("triangle_count", [
            ("oriented edges", m // 2 * 16, m // 2 * 16),
            ("wedge join rows", m * 16, int(m * math.sqrt(max(m, 1)) * 16)),
        ])

    def louvain(n, m, c):
        levels = c.get("max_levels", 10)
        per_level = _tree("per level", [
            ("community map", 16 * n, 16 * n),
            ("k_i_c aggregation", m * 24, m * 24),
            ("contracted graph", m * 24 // 4, m * 24),
        ])
        return MemoryTree(
            "louvain",
            per_level.min_bytes + 16 * n,
            per_level.max_bytes * min(levels, 3) + 16 * n,
            [per_level,
             MemoryTree("global node→community mapping", 16 * n, 16 * n)],
        )

    def betweenness(n, m, c):
        s = c.get("sampling_size") or n
        return _tree("betweenness", [
            ("(source, vertex) BFS state", s * 24, s * n * 24),
            ("dependency accumulation", 8 * n, s * 8 * n),
        ])

    def node_similarity(n, m, c):
        top_k = c.get("top_k", 10)
        cap = c.get("max_shared_degree", 100_000)
        return _tree("node_similarity", [
            ("degree vectors", 16 * n, 16 * n),
            ("wedge rows (hub-capped)", m * 24, m * min(cap, m) * 24),
            ("top-k heap rows", n * top_k * 24, n * top_k * 24),
        ])

    def fastrp(n, m, c):
        dim = c.get("embedding_dim", 128)
        iters = len(c.get("iteration_weights", (1.0, 1.0, 1.0)))
        return _tree("fastrp", [
            ("embeddings (current + previous)", 2 * n * dim * 8,
             2 * n * dim * 8),
            ("neighbor aggregation shuffle", m * dim * 8 // 8,
             m * dim * 8 * iters // 4),
        ])

    def node2vec(n, m, c):
        wpn = c.get("walks_per_node", 10)
        wl = c.get("walk_length", 80)
        dim = c.get("embedding_dimension", 128)
        return _tree("node2vec", [
            ("walk corpus", n * wpn * wl * 8, n * wpn * wl * 8),
            ("word2vec weights (in + out)", 2 * n * dim * 4, 2 * n * dim * 8),
        ])

    def closeness(n, m, c):
        batches = 1  # one 64-source bitmask batch resident at a time
        return _tree("closeness", [
            ("MSBFS bitmasks (seen|next, 64 sources/batch)",
             batches * 2 * 8 * n, batches * 2 * 8 * n),
            ("hop tallies", 16 * n, 16 * n),
            ("bitmask OR shuffle", 0, m * 16),
        ])

    def all_shortest_paths(n, m, c):
        srcs = c.get("n_sources", n)
        return _tree("allShortestPaths", [
            ("MSBFS bitmasks (visited|frontier)", 2 * 8 * n, 2 * 8 * n),
            ("emitted (source, target, dist) rows", 0, srcs * n * 24),
            ("bitmask OR shuffle", 0, m * 16),
        ])

    def sssp(n, m, c):
        return _tree("sssp", [
            ("distances + predecessor", 16 * n, 24 * n),
            ("frontier relaxation messages", 0, m * 16),
        ])

    def scc(n, m, c):
        return _tree("scc", [
            ("fwd/bwd color labels", 2 * 8 * n, 2 * 8 * n),
            ("reachability messages per round", 0, m * _MSG),
        ])

    def k1coloring(n, m, c):
        return _tree("k1coloring", [
            ("colors", 8 * n, 8 * n),
            ("conflict join + forbidden sets", m * 12, m * 20),
        ])

    def hits(n, m, c):
        return _tree("hits", [
            ("hub + authority doubles", 2 * 8 * n, 2 * 8 * n),
            ("superstep messages (both directions)", 0, 2 * m * _MSG),
        ])

    def hdbscan(n, m, c):
        k = int(c.get("samples", 5)) if c else 5
        return _tree("hdbscan", [
            ("kNN pairs (exact baseline n²; bucketed with knn_edges)",
             0, n * n * 16),
            ("core distances", 16 * n, 16 * n),
            ("MST forest (driver, condensation)", 24 * n, 24 * n),
            ("kNN edge table", 24 * k * n, 24 * k * n),
        ])

    def maxkcut(n, m, c):
        k = int(c.get("k", 2)) if c else 2
        return _tree("maxkcut", [
            ("assignment", 8 * n, 8 * n),
            ("candidate (node, community) grid", 0, k * n * 24),
            ("weight-to-community messages", 0, 2 * m * _MSG),
        ])

    def prize_steiner(n, m, c):
        return _tree("prize_steiner", [
            ("MSF forest edges", 24 * n, 24 * n),
            ("Borůvka component labels + cheapest-edge picks",
             16 * n, 16 * n + m * _MSG),
            ("peel state (val + parent + kept)", 33 * n, 33 * n),
            ("pointer-doubling chain resolution", 17 * n, 17 * n),
        ])

    def node_regression(n, m, c):
        d = int(c.get("features", 2)) if c else 2
        return _tree("node_regression", [
            ("feature vectors", n * d * 8, n * d * 8),
            ("normal-equation partials (d+1)^2 per partition",
             (d + 1) * (d + 1) * 8, (d + 1) * (d + 1) * 8 * 64),
            ("split hash projections", 0, 8 * n),
        ])

    def knn(n, m, c):
        k = c.get("top_k", 10)
        dim = c.get("dim", 128)
        return _tree("knn", [
            ("vectors", n * dim * 8, n * dim * 8),
            ("LSH buckets + candidate pairs", n * 24, n * k * 8 * 24),
        ])

    def pregel(n, m, c):
        state_doubles = c.get("state_doubles", 2)
        return _tree("pregel", [
            ("vertex state blobs", state_doubles * 8 * n,
             state_doubles * 8 * n),
            ("messages", 0, m * _MSG),
            _csr(n, m),
        ])

    def graphsage(n, m, c):
        dim = c.get("embedding_dim", 64)
        layers = len(c.get("sample_sizes", [25, 10]))
        batch = c.get("batch_size", 256)
        fanout = 1
        for s in c.get("sample_sizes", [25, 10]):
            fanout *= s
        return _tree("graphSage", [
            ("layer weights (2 matrices/layer)",
             layers * 2 * dim * dim * 8, layers * 2 * dim * dim * 8),
            ("embeddings (one layer live)", n * dim * 8, 2 * n * dim * 8),
            ("neighbor-mean messages", 0, m * dim * 8),
            ("driver minibatch subgraph", batch * fanout * dim * 8,
             batch * fanout * dim * 8),
        ])

    def node_classification(n, m, c):
        f = c.get("n_features", 8)
        classes = c.get("n_classes", 2)
        return _tree("nodeClassification", [
            ("feature vectors", n * f * 8, n * f * 8),
            ("L-BFGS state (10 corrections)", 10 * f * classes * 8,
             10 * f * classes * 8),
            ("prediction frame", n * (8 + classes * 8),
             n * (8 + classes * 8)),
        ])

    def link_prediction(n, m, c):
        f = c.get("n_features", 8)
        cand = c.get("max_candidates_per_node", 50)
        return _tree("linkPrediction", [
            ("pair features (train+test splits)", m * f * 8, 2 * m * f * 8),
            ("L-BFGS state", 10 * f * 8, 10 * f * 8),
            ("candidate wedge pairs (capped)", 0, n * cand * 24),
        ])

    def topological_sort(n, m, c):
        return _tree("topological_sort", [
            ("live node / layer tables", 2 * 8 * n, 3 * 8 * n),
            ("live edges (shrinking per round)", m * 16, m * 24),
            ("per-round in-degree agg", 0, m * _MSG),
        ])

    def bellman_ford(n, m, c):
        return _tree("bellman_ford", [
            ("distance table (current + merged)", 2 * 16 * n, 2 * 16 * n),
            ("frontier relaxation messages", 0, m * _MSG),
        ])

    def conductance(n, m, c):
        return _tree("conductance", [
            ("community map (broadcast)", 16 * n, 16 * n),
            ("tagged edge scan (streaming agg)", 0, m * 8),
        ])

    def leiden(n, m, c):
        levels = c.get("max_levels", 10)
        return _tree("leiden", [
            ("symmetrized weighted edges", 2 * m * 24, 2 * m * 24),
            ("assignment + refined maps", 3 * 8 * n, 4 * 8 * n),
            ("kic/ctot per sweep", 0, 2 * m * _MSG),
            ("per-level WCC refinement", 8 * n, levels * 8 * n),
        ])

    def hashgnn(n, m, c):
        density = c.get("density", 4)
        return _tree("hashgnn", [
            ("active-bit sets (current + next)", 2 * n * density * 12,
             2 * n * density * 12),
            ("per-iteration keyed candidates",
             0, (n + m) * density * 20),
        ])

    def sllpa(n, m, c):
        iters = c.get("max_iterations", 10)
        return _tree("sllpa", [
            ("label memories (grow 1 label/round heard)",
             n * 16, n * (1 + iters) * 16),
            ("per-round spoken labels", 0, m * (1 + iters) * 24),
        ])

    def biconnectivity(n, m, c):
        import math

        logn = max(1, int(math.log2(max(2, n))))
        return _tree("biconnectivity", [
            ("spanning forest + tour arcs (2(V-1) x state row)",
             2 * n * 40, 2 * n * 40),
            ("Wyllie ranking joins per round", 0, 2 * n * 32),
            ("sparse-table levels (n log n rows of (k,i,mn,mx))",
             n * logn * 28, n * logn * 28),
            ("auxiliary graph (<= E unite rows + labels)",
             m * 16, 3 * m * 16),
        ])

    def rwr_sample(n, m, c):
        walks = c.get("walks_per_batch", 128) * c.get("max_batches", 64)
        length = c.get("walk_length", 8)
        return _tree("rwr_sample", [
            ("sorted adjacency lists", m * 8 + n * 8, m * 8 + n * 8),
            ("walk frontier rows", walks * 24, walks * 24),
            ("visited accumulator", 8 * 1024, 8 * min(n, walks * length)),
        ])

    return {
        "pagerank": pagerank, "article_rank": pagerank,
        "eigenvector": pagerank, "wcc": wcc,
        "label_propagation": label_propagation,
        "triangle_count": triangle_count, "louvain": louvain,
        "modularity_optimization": louvain, "betweenness": betweenness,
        "node_similarity": node_similarity, "fastrp": fastrp,
        "node2vec": node2vec, "closeness": closeness, "harmonic": closeness,
        "sssp": sssp, "dijkstra": sssp, "scc": scc,
        "k1coloring": k1coloring, "kcore": kcore, "hits": hits, "knn": knn,
        "maxkcut": maxkcut, "hdbscan": hdbscan,
        "prize_steiner": prize_steiner,
        "node_regression": node_regression,
        "all_shortest_paths": all_shortest_paths,
        "topological_sort": topological_sort,
        "dag_longest_path": topological_sort,
        "bellman_ford": bellman_ford, "conductance": conductance,
        "leiden": leiden, "rwr_sample": rwr_sample, "hashgnn": hashgnn,
        "sllpa": sllpa,
        "biconnectivity": biconnectivity,
        "bridges": biconnectivity,
        "articulation_points": biconnectivity,
        "pregel": pregel, "graphsage": graphsage,
        "node_classification": node_classification,
        "link_prediction": link_prediction,
    }


_ESTIMATORS = _estimators()


def estimate_algorithm(
    algorithm: str, node_count: int, relationship_count: int, **config
) -> dict:
    """Reference-shaped estimate result (requiredMemory / treeView /
    mapView + counts) for one algorithm at (n, m).

    ref: proc/.../MemoryEstimateResult.java — fields requiredMemory,
    treeView, mapView, nodeCount, relationshipCount, bytesMin, bytesMax.
    """
    fn = _ESTIMATORS.get(algorithm)
    if fn is None:
        raise KeyError(
            f"no estimator for {algorithm!r}; known: "
            + ", ".join(sorted(_ESTIMATORS))
        )
    tree = fn(int(node_count), int(relationship_count), config)
    tree.name = algorithm  # aliases (article_rank→pagerank tree, …)
    return {
        "nodeCount": int(node_count),
        "relationshipCount": int(relationship_count),
        "bytesMin": tree.min_bytes,
        "bytesMax": tree.max_bytes,
        "requiredMemory": "[%s ... %s]"
        % (_human(tree.min_bytes), _human(tree.max_bytes)),
        "treeView": tree.render(),
        "mapView": _map_view(tree),
    }


def _map_view(tree: MemoryTree) -> dict:
    return {
        "name": tree.name,
        "memoryUsage": "[%s ... %s]"
        % (_human(tree.min_bytes), _human(tree.max_bytes)),
        "components": [_map_view(c) for c in tree.children],
    }


def estimate_graph(graph: Graph, algorithm: str = "pregel", **config) -> dict:
    return estimate_algorithm(
        algorithm, graph.node_count(), graph.relationship_count(), **config
    )
