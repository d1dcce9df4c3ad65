"""Pure NumPy/Python oracles, independent of the Spark engine.

Modeled on the reference's own test strategy (SURVEY.md §5): the PageRank
power method is a port of the oracle the reference tests *itself* against
(``algo/tests/test_pagerank.rs:297-370``); components use union-find;
triangles brute force; label propagation a direct synchronous re-impl.
"""

from __future__ import annotations

import numpy as np


def pagerank_power(
    n: int,
    edges: list[tuple[int, int]],
    alpha: float = 0.85,
    mode: str = "strongly",
    preference: np.ndarray | None = None,
    tol: float = 1e-12,
    max_iter: int = 10_000,
    fixed_iters: int | None = None,
) -> np.ndarray:
    """Power-method PageRank with the reference's three dangling modes."""
    v = (
        np.full(n, 1.0 / n)
        if preference is None
        else np.asarray(preference, dtype=float)
    )
    if mode == "strongly":
        u = v
    elif mode == "weakly":
        u = np.full(n, 1.0 / n)
    elif mode == "pseudo":
        u = np.zeros(n)
    else:
        raise ValueError(mode)
    out_deg = np.zeros(n, dtype=np.int64)
    for s, _ in edges:
        out_deg[s] += 1
    x = v.copy()
    it = 0
    while True:
        contrib = np.zeros(n)
        for s, d in edges:
            contrib[d] += x[s] / out_deg[s]
        dangling = x[out_deg == 0].sum()
        new = (1.0 - alpha) * v + alpha * (contrib + dangling * u)
        delta = np.abs(new - x).sum()
        x = new
        it += 1
        if fixed_iters is not None:
            if it >= fixed_iters:
                return x
        elif (alpha / (1.0 - alpha)) * delta <= tol or it >= max_iter:
            return x


def union_find_components(n: int, edges: list[tuple[int, int]]) -> np.ndarray:
    """Min-id component label per node (undirected view of edges)."""
    parent = list(range(n))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for s, d in edges:
        ra, rb = find(s), find(d)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-id labels
    labels = np.empty(n, dtype=np.int64)
    roots: dict[int, int] = {}
    for i in range(n):
        r = find(i)
        if r not in roots:
            roots[r] = r  # find() path-compresses to min? not guaranteed -> fix below
        labels[i] = r
    # ensure label = min id in component
    comp_min: dict[int, int] = {}
    for i in range(n):
        r = labels[i]
        comp_min[r] = min(comp_min.get(r, i), i)
    return np.array([comp_min[labels[i]] for i in range(n)], dtype=np.int64)


def brute_triangles(n: int, edges: list[tuple[int, int]]) -> int:
    """Total undirected triangles (ignoring direction, loops, multi-edges)."""
    adj: list[set[int]] = [set() for _ in range(n)]
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    count = 0
    for u in range(n):
        for w in adj[u]:
            if w > u:
                count += len([x for x in adj[u] & adj[w] if x > w])
    return count


def triangles_per_vertex_brute(n: int, edges: list[tuple[int, int]]) -> np.ndarray:
    adj: list[set[int]] = [set() for _ in range(n)]
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    out = np.zeros(n, dtype=np.int64)
    for u in range(n):
        for w in adj[u]:
            if w > u:
                for x in adj[u] & adj[w]:
                    if x > w:
                        out[u] += 1
                        out[w] += 1
                        out[x] += 1
    return out


def label_propagation_sync(
    n: int, edges: list[tuple[int, int]], iters: int, symmetrize: bool = True
) -> np.ndarray:
    """Synchronous LP, max count then min label tie-break; matches engine."""
    nbrs_in: list[list[int]] = [[] for _ in range(n)]
    seen = set()
    for s, d in edges:
        if s == d:
            continue
        pairs = [(s, d), (d, s)] if symmetrize else [(s, d)]
        for a, b in pairs:
            if (a, b) not in seen:
                seen.add((a, b))
                nbrs_in[b].append(a)
    labels = np.arange(n, dtype=np.int64)
    for _ in range(iters):
        new = labels.copy()
        for v in range(n):
            if not nbrs_in[v]:
                continue
            counts: dict[int, int] = {}
            for u in nbrs_in[v]:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        labels = new
    return labels


def bfs_distances_oracle(
    n: int, edges: list[tuple[int, int]], roots: list[int]
) -> dict[int, int]:
    from collections import deque

    adj: list[list[int]] = [[] for _ in range(n)]
    for s, d in edges:
        adj[s].append(d)
    dist = {r: 0 for r in roots}
    q = deque(roots)
    while q:
        u = q.popleft()
        for w in adj[u]:
            if w not in dist:
                dist[w] = dist[u] + 1
                q.append(w)
    return dist


# ----------------------------------------------------------- fixture graphs


def canonical8() -> tuple[int, list[tuple[int, int]]]:
    """The reference's shared 8-node/11-arc test graph
    (``webgraph/tests/common/mod.rs:15-40``): source 0, sink 7,
    cycle 2 -> 4 -> 6 -> 2."""
    return 8, [
        (0, 1),
        (0, 2),
        (1, 3),
        (2, 4),
        (3, 5),
        (4, 6),
        (5, 7),
        (6, 2),
        (6, 7),
        (2, 7),
        (1, 7),
    ]


def clique_cycle(
    k: int, p: int, bridge: str = "none"
) -> tuple[int, list[tuple[int, int]]]:
    """k-clique (nodes 0..k) + p-cycle (nodes k..k+p), optional bridge.

    Mirror of the reference's analytic PageRank families
    (``algo/tests/test_pagerank.rs:23-61``). bridge in
    {none, forward, back, bi}: forward = clique node 0 -> cycle node k.
    """
    edges = [(i, j) for i in range(k) for j in range(k) if i != j]
    edges += [(k + i, k + ((i + 1) % p)) for i in range(p)]
    if bridge in ("forward", "bi"):
        edges.append((0, k))
    if bridge in ("back", "bi"):
        edges.append((k, 0))
    return k + p, edges


def erdos_renyi(n: int, p: float, seed: int) -> tuple[int, list[tuple[int, int]]]:
    """Seeded loopless directed ER graph (reference:
    ``webgraph/src/graphs/random/er.rs:31``)."""
    rng = np.random.default_rng(seed)
    mat = rng.random((n, n)) < p
    np.fill_diagonal(mat, False)
    src, dst = np.nonzero(mat)
    return n, list(zip(src.tolist(), dst.tolist()))


def star_hub(n: int, dangling_leaves: int = 3) -> tuple[int, list[tuple[int, int]]]:
    """Hub node 0 with n-1 in-edges; last ``dangling_leaves`` nodes isolated
    dangling sinks reachable from the hub. Skew + dangling-mass stress."""
    edges = [(i, 0) for i in range(1, n - dangling_leaves)]
    edges += [(0, n - 1 - i) for i in range(dangling_leaves)]
    return n, edges


def kosaraju_scc(n: int, edges: list[tuple[int, int]]) -> np.ndarray:
    """Min-id SCC label per node — iterative Kosaraju (two sweeps), the
    pure-Python oracle mirroring the reference's own SCC test strategy
    (``algo/tests/test_sccs.rs:212-229``: ER graphs checked Tarjan vs
    Kosaraju)."""
    adj: list[list[int]] = [[] for _ in range(n)]
    radj: list[list[int]] = [[] for _ in range(n)]
    for s, d in edges:
        if s != d:
            adj[s].append(d)
            radj[d].append(s)
    visited = [False] * n
    order: list[int] = []
    for s0 in range(n):
        if visited[s0]:
            continue
        visited[s0] = True
        stack: list[tuple[int, iter]] = [(s0, iter(adj[s0]))]
        while stack:
            node, it = stack[-1]
            advanced = False
            for nxt in it:
                if not visited[nxt]:
                    visited[nxt] = True
                    stack.append((nxt, iter(adj[nxt])))
                    advanced = True
                    break
            if not advanced:
                order.append(node)
                stack.pop()
    labels = np.full(n, -1, dtype=np.int64)
    for s0 in reversed(order):
        if labels[s0] != -1:
            continue
        comp = [s0]
        labels[s0] = s0
        dfs = [s0]
        while dfs:
            u = dfs.pop()
            for w in radj[u]:
                if labels[w] == -1:
                    labels[w] = s0
                    comp.append(w)
                    dfs.append(w)
        m = min(comp)
        for u in comp:
            labels[u] = m
    return labels
