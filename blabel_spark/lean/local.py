"""Graph leaning: compute the core of an RDF graph (single-machine kernel).

Re-expresses the semantics of the reference's leaning stack
(``lean/GraphLeaning.java`` + DFS/BFS subclasses): a graph is *lean* iff it
admits no proper endomorphism — no mapping h of blank nodes to terms
(identity on ground terms) with h(G) ⊆ G covering strictly fewer blank
nodes.  Leaning removes redundant triples and returns the witness map
(coreMap, GraphLeaning.java:236-251) so every input bnode is accounted for.

Unlike the reference's 700-line staged search (trivial filter → ground
candidates → selectivity-ordered pattern join → DFS with orbit pruning),
this clean-room kernel uses the definition directly:

1. a cheap trivial-non-lean pre-filter (edge-multiset containment,
   mirroring GraphLeaning.filterTrivialNonLeanBnodes:320-437) to fixpoint;
2. a most-constrained-first backtracking search for a proper endomorphism,
   with per-bnode candidate sets pruned by (pred, direction) signature
   containment (the same pruning idea as findGroundCandidates:550-602);
3. recursion on the mapped graph until no proper endomorphism exists
   (DFSGraphLeaning.call:63-83), composing witnesses transitively
   (GraphLeaning.transitiveClosure:448-483).

The result is THE core (unique up to isomorphism); the reference's own
test framework validates its five leaning configs the same way — by
canonical-form equality of outputs, not witness equality
(TestFramework.java:151-155,235-241).

The search is exponential in the worst case; ``budget`` caps visited
assignments (the reference caps wall-clock instead, RunNQuadsTest.java:76).
"""

from __future__ import annotations

from dataclasses import dataclass

from blabel_spark.canon.local import Triple, is_bnode


class LeanBudgetExceeded(Exception):
    pass


@dataclass
class LeanResult:
    lean: tuple[Triple, ...]          # sorted distinct lean triples
    core_map: dict[str, str]          # every input bnode → surviving term
    removed: int                      # triples dropped


def _signatures(triples: list[Triple]) -> dict[str, set[tuple[str, str]]]:
    """node → set of (pred, direction) — the coarse edge signature used to
    prune endomorphism candidates."""
    sig: dict[str, set[tuple[str, str]]] = {}
    for s, p, o in triples:
        sig.setdefault(s, set()).add((p, "+"))
        sig.setdefault(o, set()).add((p, "-"))
    return sig


def _edge_sets(triples: list[Triple]) -> dict[str, set[tuple[str, str, str]]]:
    """node → set of (direction, pred, other-end) — exact edges, the
    trivial-filter containment domain (GraphLeaning.indexAllEdges:485-514)."""
    es: dict[str, set[tuple[str, str, str]]] = {}
    for s, p, o in triples:
        es.setdefault(s, set()).add(("+", p, o))
        es.setdefault(o, set()).add(("-", p, s))
    return es


def _apply(h: dict[str, str], triples) -> set[Triple]:
    return {(h.get(s, s), p, h.get(o, o)) for s, p, o in triples}


def _trivial_filter(triples: set[Triple]) -> tuple[set[Triple], dict[str, str]]:
    """One trivial-non-lean mapping: the smallest bnode b whose exact edge
    set is contained in some other node y's (b's self-references read as
    y) maps to y (GraphLeaning.filterTrivialNonLeanBnodes:320-437).

    Exactly ONE mapping is applied per pass: mapping only b keeps every
    other term fixed, so sub(E(b)) ⊆ E(y) directly implies h(G) ⊆ G —
    simultaneous mappings could invalidate each other's containments when
    a redundant bnode's edges reference another remapped bnode.  The
    caller iterates to fixpoint, mirroring the reference's outer loop
    (GraphLeaning.java:121-140).  Equal-edge-set bnodes keep the smallest.
    """
    es = _edge_sets(sorted(triples))
    # most-selective-edge index: a candidate superset-node must share b's
    # rarest edge (the reference's selectivity indexing, GraphLeaning.java:
    # 836-850) — self-loop edges are excluded from the probe since they
    # read differently after substitution
    by_edge: dict[tuple[str, str, str], list[str]] = {}
    for n, en in es.items():
        for e in en:
            by_edge.setdefault(e, []).append(n)
    accepted: dict[str, str] = {}
    for b in sorted(n for n in es if is_bnode(n)):
        if b in accepted:
            continue
        eb = es[b]
        # guard: b's mapping rewrites its triples as (b,p,z)→(y,p,z),
        # which is only covered by the containment check if neither y nor
        # any value z of b's edges is itself remapped this pass
        values = {v for _, _, v in eb}
        if values & accepted.keys():
            continue
        probes = [e for e in eb if e[2] != b]
        if probes:
            rare = min(probes, key=lambda e: len(by_edge[e]))
            cand_pool = by_edge[rare]
        else:
            cand_pool = list(es)  # pure self-loop bnode: rare, scan all
        for y in sorted(cand_pool):
            if y == b or y in accepted:
                continue
            ey = es[y]
            if len(eb) > len(ey):
                continue
            # substitute b→y inside b's own edges (self-loops must map)
            sub = {(d, p, y if v == b else v) for d, p, v in eb}
            if sub <= ey:
                if is_bnode(y) and es[y] == eb and y > b:
                    continue  # identical twins: keep the smaller name
                accepted[b] = y
                break
    if not accepted:
        return triples, {}
    return _apply(accepted, triples), accepted


def _find_proper_endo(triples: set[Triple], budget: int,
                      order: str = "bindcount", seed: int = 0,
                      prune: bool = True) -> dict[str, str] | None:
    """Backtracking search for a proper endomorphism h (h(G) ⊆ G, identity
    on ground, image covering strictly fewer bnodes).

    ``order``/``prune`` mirror the reference's leaning config matrix
    (GraphLeaning.java:89-105 randomised candidate order; TestFramework
    runs ordered/random × prune/no-prune and requires one canonical core
    across all of them, TestFramework.java:151-155,235-241):
    ``order="bindcount"`` (the default, like the reference's) re-sorts
    each pool at assignment time: ground terms first, then terms most
    frequently bound already, then non-self matches (NodeBindCount
    ordering, GraphLeaning.getBindings:720-800 — reusing bound targets
    makes the mapping proper sooner); ``order="sorted"`` keeps the
    static pool order; ``order="random"`` shuffles each pool with
    ``seed``;
    ``prune=False`` drops the signature/ground-edge candidate pruning and
    searches every node — semantics-neutral (pruning only removes
    candidates that cannot satisfy the consistency check), so all configs
    must produce canonically equal cores.

    Decomposition: if G admits a proper endomorphism h, pick a bnode b
    outside h's image and restrict h to b's connected bnode-component C,
    identity elsewhere — still an endomorphism (h(C) ⊆ G) and still proper
    (b stays outside the image).  So it suffices to search each component
    separately for a homomorphism C → G that misses one of C's own bnodes;
    components are small even when graphs are large, while candidates
    still range over the whole graph (cross-component folding works).
    The returned map is identity outside the found component.

    Heuristics mirror the reference's search stage: candidate sets pruned
    by (pred, direction) signature containment (findGroundCandidates,
    GraphLeaning.java:550-602), bnodes ordered connectivity-first so
    consistency failures surface early (the shared-variable adjacency
    rule of the pattern ordering, GraphLeaning.java:852-913).
    """
    import random as _random

    from blabel_spark.canon.local import blank_node_components
    rng = _random.Random(seed)
    tl = sorted(triples)
    sig = _signatures(tl)
    by_sig: dict[tuple[str, str], list[str]] = {}
    for n, sn in sig.items():
        for pd in sn:
            by_sig.setdefault(pd, []).append(n)
    # exact ground-edge sets: a homomorphism target for b must carry every
    # ground edge b carries (the reference's ground-candidate fixpoint,
    # GraphLeaning.findGroundCandidates:550-602) — far more selective than
    # the (pred, dir) signature alone
    ges = {n: {e for e in en if not is_bnode(e[2])}
           for n, en in _edge_sets(tl).items()}
    tset = triples
    by_subj: dict[str, list[Triple]] = {}
    by_obj: dict[str, list[Triple]] = {}
    for t in tl:
        by_subj.setdefault(t[0], []).append(t)
        by_obj.setdefault(t[2], []).append(t)

    def search_component(ctriples: list[Triple]) -> dict[str, str] | None:
        visited = [0]  # budget is per component: caps pathological
        # components without penalising corpus size
        cbnodes = sorted({n for t in ctriples for n in (t[0], t[2])
                          if is_bnode(n)})
        cset = set(cbnodes)
        # candidate pool via rarest (pred, direction) index instead of a
        # full term scan (selectivity ordering, GraphLeaning.java:852-913)
        cands = {}
        for b in cbnodes:
            if prune:
                sb = sig[b]
                rare = min(sb, key=lambda pd: len(by_sig.get(pd, ())))
                pool = by_sig.get(rare, [])
                cands[b] = sorted(
                    {t for t in pool
                     if t == b or (sb <= sig[t] and ges[b] <= ges[t])} | {b})
            else:
                cands[b] = sorted(set(sig) | {b})
            if order == "random":
                rng.shuffle(cands[b])
        # connectivity-first ordering seeded by the most constrained bnode
        visit_order: list[str] = []
        remaining = set(cbnodes)
        while remaining:
            adjacent = [b for b in remaining
                        if any(n in visit_order for t in by_subj.get(b, [])
                               + by_obj.get(b, []) for n in (t[0], t[2]))]
            pool = adjacent or sorted(remaining)
            nxt = min(pool, key=lambda b: (len(cands[b]), b))
            visit_order.append(nxt)
            remaining.discard(nxt)

        h: dict[str, str] = {}

        def consistent(b: str) -> bool:
            for s, p, o in by_subj.get(b, []) + by_obj.get(b, []):
                hs = h.get(s) if is_bnode(s) else s
                ho = h.get(o) if is_bnode(o) else o
                # unassigned bnodes outside C are identity
                if hs is None and is_bnode(s) and s not in cset:
                    hs = s
                if ho is None and is_bnode(o) and o not in cset:
                    ho = o
                if hs is not None and ho is not None \
                        and (hs, p, ho) not in tset:
                    return False
            return True

        def proper() -> bool:
            image = {v for v in h.values() if is_bnode(v)}
            return any(b not in image for b in cbnodes)

        def dfs(i: int) -> bool:
            if i == len(visit_order):
                return proper()
            b = visit_order[i]
            if order == "bindcount":
                bound: dict[str, int] = {}
                for v in h.values():
                    bound[v] = bound.get(v, 0) + 1
                pool = sorted(cands[b], key=lambda c: (
                    is_bnode(c), -bound.get(c, 0), c == b, c))
            else:
                pool = cands[b]
            for c in pool:
                visited[0] += 1
                if visited[0] > budget:
                    raise LeanBudgetExceeded(f"budget {budget} exceeded")
                h[b] = c
                if consistent(b) and dfs(i + 1):
                    return True
                del h[b]
            return False

        return dict(h) if dfs(0) else None

    # One pass over ALL components, maps applied simultaneously.  Each
    # accepted map is component-local (sound on its own); the guard below
    # rejects maps whose image touches bnodes already being remapped this
    # round, which (a) keeps the union of accepted maps an endomorphism
    # that strictly removes every accepted component's missing bnode and
    # (b) breaks the livelock of two isomorphic components folding onto
    # each other simultaneously (the second one waits for the next round).
    comps = blank_node_components(tl)
    accepted: dict[str, str] = {}
    remapped: set[str] = set()
    for pivot in sorted(comps):
        found = search_component(comps[pivot])
        if found is None:
            continue
        image_bnodes = {v for v in found.values() if is_bnode(v)}
        if image_bnodes & remapped:
            continue
        accepted.update(found)
        remapped |= set(found)
    return accepted or None


def lean_graph(triples: list[Triple], budget: int = 200_000,
               order: str = "bindcount", seed: int = 0,
               prune: bool = True) -> LeanResult:
    """Compute the core of the graph with a complete witness map.

    ``order``/``seed``/``prune`` select a search config from the
    reference's metamorphic matrix (see ``_find_proper_endo``); every
    config yields the same core up to isomorphism."""
    n_in = len(set(triples))
    current: set[Triple] = set(triples)
    core: dict[str, str] = {}
    for t in triples:
        for i in (0, 2):
            if is_bnode(t[i]):
                core.setdefault(t[i], t[i])

    def compose(h: dict[str, str]) -> None:
        for k, v in core.items():
            core[k] = h.get(v, v)

    # trivial pre-filter to fixpoint (GraphLeaning.java:121-140)
    while True:
        nxt, wit = _trivial_filter(current)
        if not wit:
            break
        current = nxt
        compose(wit)

    # full search to fixpoint
    while True:
        h = _find_proper_endo(current, budget, order, seed, prune)
        if h is None:
            break
        current = _apply(h, current)
        compose(h)

    return LeanResult(lean=tuple(sorted(current)), core_map=core,
                      removed=n_in - len(current))
