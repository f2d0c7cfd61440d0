"""Tiny hand-checked fixture graphs (FIXTURES.md F3) + pure-Python/NumPy
oracles implementing exactly the reference recurrences (SURVEY §2.3)."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np

from fog_spark.hashing import pmod, xxhash64

# F3.1 chain
CHAIN5 = [(0, 1), (1, 2), (2, 3), (3, 4)]
# F3.2 two directed 3-cliques + isolated vertex 6 (pass n_vertices=7)
TWO_TRIANGLES = [
    (0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1),
    (3, 4), (4, 3), (3, 5), (5, 3), (4, 5), (5, 4),
]
# F3.3 hub 0 -> 1..9, plus back-edge 9 -> 0
STAR_HUB = [(0, i) for i in range(1, 10)] + [(9, 0)]
# F3.4 self-loop semantics pin
SELFLOOP_PAIR = [(0, 0), (0, 1), (1, 0)]

ALL_GRAPHS = {
    "chain5": (CHAIN5, 5),
    "two_triangles": (TWO_TRIANGLES, 7),
    "star_hub": (STAR_HUB, 10),
    "selfloop_pair": (SELFLOOP_PAIR, 2),
}


def weight(s: int, d: int) -> float:
    return 1.0 + pmod(xxhash64(s, d), 9000) / 1000.0


def fog_pagerank_oracle(edges, n, iters=10, d=0.85):
    """rank_t(v) = rank_{t-1}(v) + sum_{u->v}(d*rank_{t-1}(u)/outdeg(u) + (1-d))
    — the reference recurrence (application/pagerank.hpp:37-94), self-loops
    included, dangling vertices emit nothing."""
    outdeg = np.zeros(n, dtype=np.int64)
    for s, _ in edges:
        outdeg[s] += 1
    rank = np.ones(n)
    for _ in range(iters):
        incoming = np.zeros(n)
        for s, t in edges:
            incoming[t] += d * rank[s] / outdeg[s] + (1 - d)
        rank = rank + incoming
    return rank


def std_pagerank_oracle(edges, n, d=0.85, tol=1e-6, max_iters=100):
    outdeg = np.zeros(n, dtype=np.int64)
    for s, _ in edges:
        outdeg[s] += 1
    rank = np.full(n, 1.0 / n)
    for it in range(max_iters):
        incoming = np.zeros(n)
        for s, t in edges:
            incoming[t] += rank[s] / outdeg[s]
        dm = rank[outdeg == 0].sum()
        new = (1 - d) / n + d * (dm / n + incoming)
        delta = np.abs(new - rank).max()
        rank = new
        if delta < tol:
            break
    return rank, it + 1


def cc_oracle(edges, n):
    """min vid per weakly-connected component (cc.hpp:59-70 fixpoint)."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, t in edges:
        rs, rt = find(s), find(t)
        if rs != rt:
            parent[max(rs, rt)] = min(rs, rt)
    return [find(v) for v in range(n)]


def lpa_oracle(edges, n, max_iters=20):
    """Synchronous LPA, most-frequent neighbor label, ties -> smallest."""
    nbrs = defaultdict(set)
    for s, t in edges:
        if s != t:
            nbrs[s].add(t)
            nbrs[t].add(s)
    label = list(range(n))
    for _ in range(max_iters):
        new = list(label)
        for v in range(n):
            if nbrs[v]:
                c = Counter(label[u] for u in nbrs[v])
                best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
                new[v] = best[0]
        if new == label:
            break
        label = new
    return label


def bfs_oracle(edges, n, root):
    adj = defaultdict(list)
    for s, t in edges:
        if s != t:
            adj[s].append(t)
    level = [None] * n
    level[root] = 0
    frontier = [root]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if level[v] is None:
                    level[v] = level[u] + 1
                    nxt.append(v)
        frontier = nxt
    return level


def sssp_oracle(edges, n, source):
    import heapq

    adj = defaultdict(list)
    for s, t in edges:
        if s != t:
            adj[s].append((t, weight(s, t)))
    dist = [float("inf")] * n
    dist[source] = 0.0
    pq = [(0.0, source)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist[u]:
            continue
        for v, w in adj[u]:
            nd = du + w
            if nd < dist[v] - 1e-12:
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def triangle_oracle(edges, n):
    und = set()
    for s, t in edges:
        if s != t:
            und.add((min(s, t), max(s, t)))
    nbrs = defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    count = 0
    for a, b in und:
        count += len([c for c in nbrs[a] & nbrs[b] if c > b])
    return count


def scc_oracle(edges, n):
    """Strongly connected components, label = min member vid. Iterative
    Tarjan (explicit stack, no recursion limit issues)."""
    adj = defaultdict(list)
    for s, t in edges:
        if s != t:
            adj[s].append(t)
    index = [None] * n
    low = [0] * n
    on_stack = [False] * n
    stack: list[int] = []
    label = [0] * n
    counter = 0
    for start in range(n):
        if index[start] is not None:
            continue
        work = [(start, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack[v] = True
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if index[w] is None:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if on_stack[w]:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    label[w] = m
            work.pop()
            if work:
                p, _ = work[-1]
                low[p] = min(low[p], low[v])
    return label


def msf_oracle(weighted_edges):
    """Kruskal with the same (w, a, b) tie-break as the Spark Borůvka.
    weighted_edges: (src, dst, w) triples; returns set of (a, b, w)."""
    pairs = {}
    for s, t, w in weighted_edges:
        if s == t:
            continue
        a, b = min(s, t), max(s, t)
        if (a, b) not in pairs or w < pairs[(a, b)]:
            pairs[(a, b)] = w
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for (a, b), w in sorted(pairs.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            forest.add((a, b, w))
    return forest


def spmv_oracle(edges, n):
    y = defaultdict(float)
    for s, t in edges:
        y[t] += 1.0 * weight(s, t)
    return dict(y)


def ppr_milli_oracle(edges, n, seed=0, iters=8):
    """Integer-milli personalized PageRank (algos.pagerank.PPRMilli),
    replace-style damped power iteration: rank_0 = 1e6 at the seed only;
    contrib = (850*rank) // (1000*outdeg);
    rank_t = sum contribs + 150_000 at the seed."""
    outdeg = Counter(s for s, _ in edges)
    rank = {v: 1_000_000 if v == seed else 0 for v in range(n)}
    for _ in range(iters):
        nxt = {v: 0 for v in range(n)}
        for s, d in edges:
            nxt[d] += (850 * rank[s]) // (1000 * outdeg[s])
        nxt[seed] += 150_000
        rank = nxt
    return rank


def kcore_oracle(edges, n, k, max_rounds=16):
    """Bounded degree peel on the undirected simple graph; returns
    {id: degree} of survivors with degree >= k after the peel."""
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    for _ in range(max_rounds):
        deg = Counter()
        for a, b in und:
            deg[a] += 1
            deg[b] += 1
        keep = {v for v, c in deg.items() if c >= k}
        nxt = {(a, b) for a, b in und if a in keep and b in keep}
        if nxt == und:
            break
        und = nxt
    deg = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    return {v: c for v, c in deg.items() if c >= k}


def random_walks_oracle(edges, walk_len=8, hash_fn="md5"):
    """Deterministic walk corpus (operators.walks.random_walks):
    {(walk_id, step): vertex}; idx = H(w, t, cur) % outdeg(cur) over
    ascending-dst neighbors; dangling vertices absorb."""
    import hashlib

    from fog_spark.hashing import pmod as _pmod, xxhash64 as _xx

    nbrs = {}
    for s, d in edges:
        nbrs.setdefault(s, []).append(d)
    for s in nbrs:
        nbrs[s].sort()

    def h(w, t, cur):
        if hash_fn == "md5":
            hx = hashlib.md5(f"{w}:{t}:{cur}".encode()).hexdigest()[:12]
            return int(hx, 16)
        return _xx(w, t, cur)

    out = {}
    for w in sorted(nbrs):
        cur = w
        out[(w, 0)] = cur
        for t in range(1, walk_len + 1):
            if cur in nbrs:
                cur = nbrs[cur][_pmod(h(w, t, cur), len(nbrs[cur]))]
            out[(w, t)] = cur
    return out


def msbfs_oracle(edges, seeds, max_rounds=16):
    """{(id, seed): dist} — directed hop distance, bounded layered
    expansion (algos.msbfs.multi_source_bfs)."""
    adj = {}
    for s, d in set(edges):
        adj.setdefault(s, set()).add(d)
    dist = {(s, s): 0 for s in seeds}
    frontier = {(s, s) for s in seeds}
    for _ in range(max_rounds):
        nxt = set()
        for v, s in frontier:
            for u in adj.get(v, ()):
                if (u, s) not in dist:
                    nxt.add((u, s))
        if not nxt:
            break
        lvl = max(dist[k] for k in frontier) + 1
        for k in nxt:
            dist[k] = lvl
        frontier = nxt
    return dist


def harmonic_milli_oracle(edges, seeds, max_rounds=16):
    """{id: (harmonic_milli, n_seeds_reaching)} over msbfs_oracle."""
    dist = msbfs_oracle(edges, seeds, max_rounds)
    out = {}
    for (v, s), d in dist.items():
        if d > 0:
            h, n = out.get(v, (0, 0))
            out[v] = (h + 1_000_000 // d, n + 1)
    return out


def anchor_reach_oracle(edges, n, n_anchors=16, rounds=8):
    """{id: (mask, n_reach)} — bitmask anchor reachability
    (algos.reach.anchor_reachability): anchors = n_anchors smallest
    (md5(id), id); bit j set iff anchor j reaches id within rounds hops."""
    import hashlib

    verts = sorted({v for e in edges for v in e})
    ranked = sorted(verts, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v))
    anchors = ranked[:n_anchors]
    mask = {v: 0 for v in verts}
    for j, a in enumerate(anchors):
        mask[a] |= 1 << j
    adj = {}
    for s, d in set(edges):
        adj.setdefault(s, set()).add(d)
    for _ in range(rounds):
        nxt = dict(mask)
        for s, ds in adj.items():
            for d in ds:
                nxt[d] |= mask[s]
        if nxt == mask:
            break
        mask = nxt
    return {v: (m, bin(m).count("1")) for v, m in mask.items()}


def node2vec_oracle(
    edges, walk_len=6, p=1, q=1, trials=3, hash_fn="md5", walks_per_vertex=1
):
    """{(walk_id, step): vertex} — node2vec rejection-sampling walks
    (operators.node2vec.node2vec_walks), exact mirror: pick idx =
    H(w,t,r,cur) % outdeg over ascending-dst multi-neighbors; accept via
    u32 * den < num * 2^32 with the class rational of the candidate;
    first accepted trial wins, else trial 1's candidate; dangling absorb."""
    import hashlib

    from fog_spark.hashing import pmod as _pmod, xxhash64 as _xx
    from fog_spark.operators.node2vec import _ratios

    ret, nb, far = _ratios(p, q)
    nbrs = {}
    for s, d in edges:
        nbrs.setdefault(s, []).append(d)
    for s in nbrs:
        nbrs[s].sort()
    nbset = set(edges)

    def h(salt, w, t, r, cur):
        if hash_fn == "md5":
            s = f"{w}:{t}:{r}:{cur}"
            if salt is not None:
                s = f"{salt}:{s}"
            return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)
        if salt is not None:
            return _xx(-7, w, t, r, cur)
        return _xx(w, t, r, cur)

    U32 = 1 << 32
    W = walks_per_vertex
    out = {}
    for start in sorted(nbrs):
        for j in range(W):
            w = start * W + j
            prev, cur = None, start
            out[(w, 0)] = cur
            for t in range(1, walk_len + 1):
                if cur not in nbrs:
                    prev = cur
                    out[(w, t)] = cur
                    continue
                deg = len(nbrs[cur])
                chosen = fallback = None
                for r in range(1, trials + 1):
                    x = nbrs[cur][_pmod(h(None, w, t, r, cur), deg)]
                    if r == 1:
                        fallback = x
                    if prev is None:
                        num, den = 1, 1
                    elif x == prev:
                        num, den = ret
                    elif (prev, x) in nbset:
                        num, den = nb
                    else:
                        num, den = far
                    u32 = _pmod(h("a", w, t, r, cur), U32)
                    if u32 * den < num * U32:
                        chosen = x
                        break
                prev, cur = cur, (chosen if chosen is not None else fallback)
                out[(w, t)] = cur
    return out


def hyperball_oracle(edges, m=16, rounds=8, hash_fn="md5"):
    """{id: (sum2k, zeros)} — HyperBall in-ball HLL sketches
    (algos.hyperball.hyperball_sketches): register-wise max propagation
    along out-edges, sum2k = sum_j 2^(rho_max - M_j) exact."""
    import hashlib

    from fog_spark.hashing import pmod as _pmod, xxhash64 as _xx

    b = m.bit_length() - 1
    rho_max = 48 - b + 1
    verts = sorted({v for e in edges for v in e})

    def h48(v):
        if hash_fn == "md5":
            return int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16)
        return _pmod(_xx(v), 1 << 48)

    regs = {}
    for v in verts:
        h = h48(v)
        r = [0] * m
        r[h % m] = rho_max - (h // m).bit_length()
        regs[v] = r
    adj = {}
    for s, d in set(edges):
        adj.setdefault(s, []).append(d)
    for _ in range(rounds):
        nxt = {v: list(r) for v, r in regs.items()}
        for s, ds in adj.items():
            for d in ds:
                nxt[d] = [max(a, c) for a, c in zip(nxt[d], regs[s])]
        if nxt == regs:
            break
        regs = nxt
    return {
        v: (
            sum(1 << (rho_max - x) for x in r),
            sum(1 for x in r if x == 0),
        )
        for v, r in regs.items()
    }


def mis_oracle(edges, max_rounds=12, hash_fn="md5"):
    """{id: True | False | None} — Luby MIS with (H48(r, id), id) hash
    priorities (algos.mis.maximal_independent_set); None = undecided at
    the round bound."""
    import hashlib

    from fog_spark.hashing import pmod as _pmod, xxhash64 as _xx

    verts = sorted({v for e in edges for v in e})
    nbrs = {v: set() for v in verts}
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)

    def h48(r, v):
        if hash_fn == "md5":
            return int(hashlib.md5(f"{r}:{v}".encode()).hexdigest()[:12], 16)
        return _pmod(_xx(r, v), 1 << 48)

    status = {}
    undecided = set(verts)
    for r in range(1, max_rounds + 1):
        pr = {v: (h48(r, v), v) for v in undecided}
        winners = {
            v
            for v in undecided
            if all(pr[u] > pr[v] for u in nbrs[v] if u in undecided)
        }
        losers = {
            u for v in winners for u in nbrs[v] if u in undecided
        } - winners
        for v in winners:
            status[v] = True
        for v in losers:
            status[v] = False
        undecided -= winners | losers
        if not undecided:
            break
    return {v: status.get(v) for v in verts}


def ktruss_oracle(edges, k, max_rounds=8):
    """{(a, b), ...} — edges of the k-truss after bounded peel rounds
    (algos.ktruss.k_truss)."""
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    for _ in range(max_rounds):
        if not und:
            break
        nbrs = {}
        for a, b in und:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        new = {
            (a, b)
            for a, b in und
            if len(nbrs[a] & nbrs[b]) >= k - 2
        }
        if new == und:
            break
        und = new
    return und


def hits_oracle(edges, iters=4):
    """{id: (auth_milli, hub_milli)} — integer-milli max-normalized HITS
    (algos.hits.hits_milli); multi-edges count with multiplicity."""
    verts = sorted({v for e in edges for v in e})
    h = {v: 1000 for v in verts}
    a = {v: 0 for v in verts}
    for _ in range(iters):
        raw = {v: 0 for v in verts}
        for s, d in edges:
            raw[d] += h[s]
        mx = max(raw.values()) if raw else 0
        a = {v: (raw[v] * 1000) // mx if mx > 0 else 0 for v in verts}
        raw = {v: 0 for v in verts}
        for s, d in edges:
            raw[s] += a[d]
        mx = max(raw.values()) if raw else 0
        h = {v: (raw[v] * 1000) // mx if mx > 0 else 0 for v in verts}
    return {v: (a[v], h[v]) for v in verts}


def sample_neighbors_oracle(edges, k, hash_fn="md5"):
    """{(src, dst), ...} — k smallest (H(src, dst), dst) per src over
    distinct out-neighbors (operators.sampling.sample_neighbors)."""
    import hashlib

    from fog_spark.hashing import xxhash64 as _xx

    def h(s, d):
        if hash_fn == "md5":
            return int(hashlib.md5(f"{s}:{d}".encode()).hexdigest()[:12], 16)
        return _xx(s, d)

    by_src = {}
    for s, d in set(edges):
        by_src.setdefault(s, []).append(d)
    out = set()
    for s, ds in by_src.items():
        for d in sorted(ds, key=lambda d: (h(s, d), d))[:k]:
            out.add((s, d))
    return out


def spcount_oracle(edges, seeds, max_rounds=16):
    """{(id, seed): (dist, sigma)} — distances + shortest-path counts
    (algos.msbfs.shortest_path_counts), simple-graph semantics."""
    adj = {}
    for s, d in set(edges):
        adj.setdefault(s, set()).add(d)
    state = {(s, s): (0, 1) for s in seeds}
    frontier = {(s, s): 1 for s in seeds}
    for r in range(1, max_rounds + 1):
        grown = {}
        for (v, s), sig in frontier.items():
            for w in adj.get(v, ()):
                if (w, s) not in state:
                    grown[(w, s)] = grown.get((w, s), 0) + sig
        if not grown:
            break
        for k, sig in grown.items():
            state[k] = (r, sig)
        frontier = grown
    return state


def modularity_oracle(edges, labels):
    """(q_plus1_milli, m) — integer modularity of a labeling over the
    canonical undirected simple graph (algos.modularity)."""
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    m = len(und)
    if m == 0:
        return None
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    ec = {}
    dc = {}
    for a, b in und:
        if labels.get(a) == labels.get(b) and labels.get(a) is not None:
            ec[labels[a]] = ec.get(labels[a], 0) + 1
    for v, d in deg.items():
        if v in labels:
            dc[labels[v]] = dc.get(labels[v], 0) + d
    qnum = sum(4 * m * ec.get(c, 0) - dcv * dcv for c, dcv in dc.items())
    return ((qnum + 4 * m * m) * 1000) // (4 * m * m), m


def ego_network_oracle(edges, seeds, k=2):
    """{(src, dst), ...} — distinct edges with both endpoints within
    directed distance <= k of some seed (algos.msbfs.ego_network)."""
    dist = msbfs_oracle(edges, seeds, max_rounds=k)
    reached = {v for (v, s) in dist}
    return {
        (s, d) for s, d in set(edges) if s in reached and d in reached
    }


def spcont_oracle(edges, seeds, max_rounds=16):
    """{(id, seed): (dist, sigma, t_cont)} — Brandes integer pair
    (algos.msbfs.sp_continuations): t(v) = 1 + sum of t over SP-DAG
    successors (dist + 1 along an edge)."""
    base = spcount_oracle(edges, seeds, max_rounds)
    adj = {}
    for s, d in set(edges):
        adj.setdefault(s, set()).add(d)
    t = {}
    for (v, s), (d, sig) in sorted(base.items(), key=lambda kv: -kv[1][0]):
        t[(v, s)] = 1 + sum(
            t[(w, s)]
            for w in adj.get(v, ())
            if (w, s) in base and base[(w, s)][0] == d + 1
        )
    return {k: (dv, sg, t[k]) for k, (dv, sg) in base.items()}


def betweenness_oracle(edges, seeds, max_rounds=16):
    """{id: betweenness} — textbook Brandes restricted to the seed
    sample (algos.msbfs.betweenness_sampled), directed, unweighted."""
    from collections import deque

    adj = {}
    for s, d in set(edges):
        adj.setdefault(s, set()).add(d)
    verts = sorted({v for e in edges for v in e})
    bc = {v: 0.0 for v in verts}
    for s in seeds:
        dist = {s: 0}
        sigma = {s: 1}
        preds = {s: []}
        order = [s]
        q = deque([s])
        while q:
            v = q.popleft()
            if dist[v] >= max_rounds:
                continue
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0
                    preds[w] = []
                    order.append(w)
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in order}
        for v in reversed(order):
            for u in preds[v]:
                delta[u] += sigma[u] / sigma[v] * (1 + delta[v])
        for v in order:
            if v != s:
                bc[v] += delta[v]
    return bc


def co_project_oracle(edges, max_dst_degree=1000, min_shared=1):
    """{(a, b): shared} — capped bipartite co-projection
    (operators.projection.co_project)."""
    by_dst = {}
    for s, d in set(edges):
        by_dst.setdefault(d, set()).add(s)
    pairs = {}
    for d, srcs in by_dst.items():
        if len(srcs) > max_dst_degree:
            continue
        ss = sorted(srcs)
        for i, a in enumerate(ss):
            for b in ss[i + 1:]:
                pairs[(a, b)] = pairs.get((a, b), 0) + 1
    return {k: v for k, v in pairs.items() if v >= min_shared}


def weighted_pagerank_milli_oracle(edges_w, niters=8):
    """{id: rank_milli} — WeightedPageRankMilli: contrib = (850 * rank *
    wm) // (1000 * swm) + 150000 per edge, multi-edges counted."""
    verts = sorted({v for s, d, _ in edges_w for v in (s, d)})
    wm = [(s, d, round(w * 1000)) for s, d, w in edges_w]
    swm = {}
    for s, _, m in wm:
        swm[s] = swm.get(s, 0) + m
    rank = {v: 1_000_000 for v in verts}
    for _ in range(niters):
        add = {v: 0 for v in verts}
        for s, d, m in wm:
            add[d] += (850 * rank[s] * m) // (1000 * swm[s]) + 150_000
        rank = {v: rank[v] + add[v] for v in verts}
    return rank


def salsa_oracle(edges, iters=4):
    """{id: (salsa_auth_milli, salsa_hub_milli)} — integer-milli
    max-normalized SALSA (algos.salsa.salsa_milli): per-edge
    degree-normalized integer quotients, multi-edges with multiplicity."""
    verts = sorted({v for e in edges for v in e})
    od = {v: 0 for v in verts}
    ind = {v: 0 for v in verts}
    for s, d in edges:
        od[s] += 1
        ind[d] += 1
    h = {v: 1000 for v in verts}
    a = {v: 0 for v in verts}
    for _ in range(iters):
        raw = {v: 0 for v in verts}
        for s, d in edges:
            raw[d] += h[s] // od[s]
        mx = max(raw.values()) if raw else 0
        a = {v: (raw[v] * 1000) // mx if mx > 0 else 0 for v in verts}
        raw = {v: 0 for v in verts}
        for s, d in edges:
            raw[s] += a[d] // ind[d]
        mx = max(raw.values()) if raw else 0
        h = {v: (raw[v] * 1000) // mx if mx > 0 else 0 for v in verts}
    return {v: (a[v], h[v]) for v in verts}


def bowtie_oracle(edges, n):
    """{id: region} — Broder bow-tie decomposition (algos.bowtie.bowtie).
    Vertices absent from the edge list are excluded (no edge-table row)."""
    from collections import defaultdict, deque

    present = sorted({v for e in edges for v in e})
    labels = scc_oracle(edges, n)
    sizes = defaultdict(int)
    for v in present:
        sizes[labels[v]] += 1
    core_label = min(
        (lbl for lbl in sizes), key=lambda lbl: (-sizes[lbl], lbl)
    )
    core = {v for v in present if labels[v] == core_label}

    fwd_adj = defaultdict(list)
    bwd_adj = defaultdict(list)
    for s, t in edges:
        if s != t:
            fwd_adj[s].append(t)
            bwd_adj[t].append(s)

    def reach(seeds, adj):
        seen = set(seeds)
        q = deque(seeds)
        while q:
            v = q.popleft()
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    q.append(w)
        return seen

    f_core = reach(core, fwd_adj)
    b_core = reach(core, bwd_adj)
    in_set = b_core - core
    out_set = f_core - core
    f_in = reach(in_set, fwd_adj)
    b_out = reach(out_set, bwd_adj)

    regions = {}
    for v in present:
        if v in core:
            regions[v] = "CORE"
        elif v in b_core:
            regions[v] = "IN"
        elif v in f_core:
            regions[v] = "OUT"
        elif v in f_in and v in b_out:
            regions[v] = "TUBE"
        elif v in f_in:
            regions[v] = "TENDRIL_IN"
        elif v in b_out:
            regions[v] = "TENDRIL_OUT"
        else:
            regions[v] = "DISC"
    return regions
