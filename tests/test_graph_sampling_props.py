"""Property tests for the round-6 contract extensions: priority-sampling
estimator algebra (q142), HRW re-shard migration invariant (q143),
degree-ordered triangle census vs brute force (q144), leakage-safe split
totality (q145), the prefix-filter completeness theorem (q146), the
Misra-Gries mergeable-summary guarantees (q152), the PassJoin
segment-blocking recall theorem (q153), SCD2 interval totality (q154),
grid-overlap-join exactness (q155), association-rule identities (q157),
the k-anonymity ladder monotonicity (q158), the ECE rollup algebra
(q159), the bilinear delta-join maintenance identity (q160), the bucketed
prefix-scan skyline theorem (q161), the chained-BPE budget contract
(q163), and random-walk determinism/on-graph invariants (q165).

All pure-python twins — the Spark implementations of the same algebra are
oracle-verified at three SFs; these pin the ALGORITHMS across random
inputs Hypothesis invents."""

import hashlib
from itertools import combinations

from hypothesis import given, settings, strategies as st


def _hex8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# --- q142: priority sampling (Duffield–Lund–Thorup) ------------------------


def _priority_estimate(weights, k, seed):
    """Pure-python twin of q142's algebra: priorities w/u with a seeded
    uniform, top-k sample, tau = (k+1)-th priority, subset-sum estimate
    over the full population."""
    import random

    rng = random.Random(seed)
    pri = sorted(
        ((w / rng.uniform(1e-12, 1.0), i, w) for i, w in enumerate(weights)),
        reverse=True,
    )
    if len(pri) <= k:
        return float(sum(weights))
    tau = pri[k][0]
    return float(sum(max(w, tau) for _, _, w in pri[:k]))


def test_priority_sampling_estimator_is_unbiased():
    """Mean of the estimator over many independent draws converges to the
    true sum (the Duffield–Lund–Thorup unbiasedness theorem) — pins the
    max(w, tau) / (k+1)-th-priority algebra, which is exactly what q142
    executes in fixed point."""
    weights = [((i * 37) % 100) + 1 for i in range(200)]
    true = float(sum(weights))
    k = 32
    trials = 2000
    mean = sum(_priority_estimate(weights, k, s) for s in range(trials)) / trials
    assert abs(mean - true) / true < 0.02, (mean, true)


def test_priority_sampling_exact_below_k():
    """n <= k: the 'sample' is the whole population and the estimate is
    exactly the true sum (q142's degenerate-population contract)."""
    weights = [5, 17, 3]
    assert _priority_estimate(weights, 32, seed=0) == float(sum(weights))


# --- q143: HRW sharding ----------------------------------------------------


def _hrw_shard(key: int, n_shards: int) -> int:
    return (
        max(_hex8(f"hrw:{key}:{s}") * 32 + s for s in range(n_shards)) % 32
    )


@settings(max_examples=30, deadline=None)
@given(st.sets(st.integers(0, 10**6), min_size=1, max_size=150))
def test_hrw_migration_only_onto_new_shard(keys):
    """Adding shard S to an HRW ring can only move a key ONTO shard S
    (weights of shards 0..S-1 are unchanged, so the argmax changes only
    when the new shard wins) — the minimal-migration property q143
    measures. Also: every unmoved key keeps its exact placement."""
    for key in keys:
        s16 = _hrw_shard(key, 16)
        s17 = _hrw_shard(key, 17)
        if s16 != s17:
            assert s17 == 16, (key, s16, s17)


# --- q144: oriented triangle census ----------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    st.sets(
        st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(
            lambda e: e[0] < e[1]
        ),
        max_size=40,
    )
)
def test_oriented_wedge_count_equals_brute_force_triangles(edges):
    """q144's algebra: orient every edge low-(deg,id) → high-(deg,id),
    close wedges at the lowest-rank apex — counts each triangle exactly
    once, for ANY graph (vs brute-force enumeration)."""
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    rk = {v: d * 2**32 + v for v, d in deg.items()}
    oriented = {
        (a, b) if rk[a] < rk[b] else (b, a) for a, b in edges
    }
    out = {}
    for u, v in oriented:
        out.setdefault(u, []).append(v)
    tri_oriented = sum(
        1
        for u, nbrs in out.items()
        for v, w in combinations(sorted(nbrs, key=lambda x: rk[x]), 2)
        if (v, w) in oriented
    )
    verts = sorted(deg)
    eset = set(edges)
    tri_brute = sum(
        1
        for x, y, z in combinations(verts, 3)
        if (x, y) in eset and (x, z) in eset and (y, z) in eset
    )
    assert tri_oriented == tri_brute


# --- q145: leakage-safe split ----------------------------------------------


def _fold(x: int) -> int:
    return _hex8(f"fold:{x}") % 10


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 60)).filter(
            lambda e: e[0] < e[1]
        ),
        max_size=50,
    )
)
def test_cluster_canonical_split_never_leaks(edges):
    """Hash-folding on the connected-component canonical (min member id)
    puts both endpoints of EVERY edge in the same fold — zero leak edges
    for any graph, the invariant q145 proves from data."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    canon = {v: find(v) for v in parent}
    for a, b in edges:
        assert _fold(canon[a]) == _fold(canon[b])


# --- q146: prefix-filter completeness --------------------------------------


def _prefix(tokens, order, t_num=7, t_den=10):
    """First p = n - ceil(t*n) + 1 tokens of the set in global order."""
    n = len(tokens)
    p = n - (t_num * n + t_den - 1) // t_den + 1
    return set(sorted(tokens, key=lambda x: order[x])[:p])


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.sets(st.integers(0, 30), min_size=1, max_size=20),
        min_size=2,
        max_size=12,
    )
)
def test_prefix_filter_never_misses_a_qualifying_pair(sets):
    """The AllPairs/PPJoin theorem behind q146: two sets with Jaccard
    >= 0.7 MUST share a token within BOTH of their df-ordered prefixes
    (the smallest common element in global order cannot sit outside
    either prefix without contradicting the overlap bound) — so q146's
    prefix-to-prefix join has perfect recall with no df cap. Checked for
    every pair of every random collection, with the exact integer
    prefix-length formula q146 uses."""
    df = {}
    for s in sets:
        for tok in s:
            df[tok] = df.get(tok, 0) + 1
    order = {tok: (d, tok) for tok, d in df.items()}
    prefixes = [_prefix(s, order) for s in sets]
    for (i, a), (j, b) in combinations(enumerate(sets), 2):
        inter = len(a & b)
        union = len(a | b)
        if inter * 10 >= union * 7:
            assert prefixes[i] & prefixes[j], (a, b)


# --- q147: KMV join-size estimation ----------------------------------------


def _kmv_joinsize(a_counts, b_counts, k):
    """Pure-python twin of q147's estimator: bottom-k manifests of md5'd
    distinct keys, union-sketch intersection estimate, avg-multiplicity
    scaling."""
    def hv(key):
        return int(hashlib.md5(f"jsz:{key}".encode()).hexdigest()[:15], 16)

    da = sorted(hv(x) for x in a_counts)
    db = sorted(hv(x) for x in b_counts)
    man_a, man_b = set(da[:k]), set(db[:k])
    union = sorted(man_a | man_b)[:k]
    n_man, n_both = len(union), sum(1 for h in union if h in man_a and h in man_b)
    numer = float((k - 1) * 2**60)
    est_union = numer / union[-1] if n_man >= k else float(n_man)
    est_inter = (n_both / n_man) * est_union if n_man else 0.0
    est_nd_a = numer / max(man_a) if len(man_a) >= k else float(len(man_a))
    est_nd_b = numer / max(man_b) if len(man_b) >= k else float(len(man_b))
    ra, rb = sum(a_counts.values()), sum(b_counts.values())
    return est_inter * (ra / est_nd_a) * (rb / est_nd_b)


@settings(max_examples=40, deadline=None)
@given(
    st.sets(st.integers(0, 10**6), min_size=1, max_size=40),
    st.sets(st.integers(0, 10**6), min_size=1, max_size=40),
    st.integers(1, 7),
    st.integers(1, 7),
)
def test_kmv_joinsize_exact_when_manifests_hold_everything(ka, kb, ma, mb):
    """Below k distinct keys per side with uniform multiplicities, the
    synopsis IS the data and the estimate equals the exact join size —
    q147's exact-path contract."""
    a = {x: ma for x in ka}
    b = {x: mb for x in kb}
    true = len(ka & kb) * ma * mb
    est = _kmv_joinsize(a, b, k=64)
    assert abs(est - true) < 1e-6, (est, true)


# --- q148: Morton interleave + zone-map audit ------------------------------


def _morton_divmod(x, y):
    """q148's DIV/% bit algebra, verbatim."""
    return sum(
        ((x // (1 << j)) % 2) * (1 << (2 * j + 1))
        + ((y // (1 << j)) % 2) * (1 << (2 * j))
        for j in range(16)
    )


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 65535), st.integers(0, 65535))
def test_morton_divmod_algebra_matches_bit_interleave(x, y):
    """The division-based Morton formula (portable to both engines)
    equals true bit interleaving."""
    z = 0
    for j in range(16):
        z |= ((x >> j) & 1) << (2 * j + 1)
        z |= ((y >> j) & 1) << (2 * j)
    assert _morton_divmod(x, y) == z


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
        min_size=1,
        max_size=200,
    )
)
def test_zone_map_skipping_never_misses_a_matching_row(pts):
    """Data-skipping soundness (the invariant that makes q148's audit
    meaningful): every point inside the query box lives in a file whose
    zone-map min-x/min-y overlap test flags it as HIT — skipped files
    provably contain no matches, for any point set and any layout."""
    sel = 8191
    files = {}
    for x, y in pts:
        files.setdefault(_morton_divmod(x, y) // (2**32 // 256), []).append((x, y))
    n_match = sum(1 for x, y in pts if x <= sel and y <= sel)
    rows_in_hit = sum(
        len(v)
        for v in files.values()
        if min(x for x, _ in v) <= sel and min(y for _, y in v) <= sel
    )
    matches_in_hit = sum(
        1
        for v in files.values()
        if min(x for x, _ in v) <= sel and min(y for _, y in v) <= sel
        for x, y in v
        if x <= sel and y <= sel
    )
    assert matches_in_hit == n_match
    assert rows_in_hit >= n_match


# --- q149: Neyman allocation -----------------------------------------------


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(10, 5000), st.floats(0.1, 500.0)),
        min_size=2,
        max_size=8,
    )
)
def test_neyman_allocation_never_worse_than_proportional(strata):
    """Neyman's theorem (the reason q149 exists): allocating n_h ∝ N_h·σ_h
    gives estimated-mean variance Σ(N_h·σ_h)²/n_h no larger than
    proportional allocation n_h ∝ N_h, for any strata profile (real-
    valued allocations; q149's fixed-point rounding is oracle-verified
    separately)."""
    n_total = 100.0
    wsum = sum(nh * s for nh, s in strata)
    nsum = sum(nh for nh, _ in strata)
    if wsum <= 0:
        return
    var_neyman = sum(
        (nh * s) ** 2 / (n_total * (nh * s) / wsum)
        for nh, s in strata
        if nh * s > 0
    )
    var_prop = sum(
        (nh * s) ** 2 / (n_total * nh / nsum) for nh, s in strata
    )
    assert var_neyman <= var_prop * (1 + 1e-9)


# --- q151: k-core peeling --------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    st.sets(
        st.tuples(st.integers(0, 20), st.integers(0, 20)).filter(
            lambda e: e[0] < e[1]
        ),
        max_size=60,
    ),
    st.integers(0, 3),
)
def test_kcore_is_order_independent(edges, shuffle_seed):
    """The k-core is UNIQUE (Seidman): peeling degree-<k vertices to a
    fixpoint yields the same surviving set regardless of removal order —
    so q151's simultaneous-round peeling (all under-degree vertices per
    round) converges to the same core a one-at-a-time peel does."""
    import random

    k = 2

    def peel_rounds(es):
        es = set(es)
        while True:
            deg = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            drop = {v for v, d in deg.items() if d < k}
            if not drop:
                return {v for e in es for v in e}
            es = {(a, b) for a, b in es if a not in drop and b not in drop}

    def peel_one_at_a_time(es, seed):
        es = set(es)
        rng = random.Random(seed)
        while True:
            deg = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            under = sorted(v for v, d in deg.items() if d < k)
            if not under:
                return {v for e in es for v in e}
            v = rng.choice(under)
            es = {(a, b) for a, b in es if a != v and b != v}

    assert peel_rounds(edges) == peel_one_at_a_time(edges, shuffle_seed)


# --- q152: Misra-Gries mergeable heavy hitters ------------------------------


def _mg_reduce(counts: dict, k: int):
    """Order-free MG summary of exact counts: subtract the (k+1)-th largest
    count from every counter, drop non-positives. Returns (summary, lam)."""
    vals = sorted(counts.values(), reverse=True)
    lam = vals[k] if len(vals) > k else 0
    return {t: c - lam for t, c in counts.items() if c - lam > 0}, lam


def _mg_q152(shard_counts: list, k: int):
    """Twin of q152's full pipeline: per-shard reduce, merge-sum, reduce
    again. Returns (estimates, err_bound)."""
    merged: dict = {}
    lam_sum = 0
    for counts in shard_counts:
        summ, lam = _mg_reduce(counts, k)
        lam_sum += lam
        for t, c in summ.items():
            merged[t] = merged.get(t, 0) + c
    final, lamp = _mg_reduce(merged, k)
    return final, lam_sum + lamp


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=150, deadline=None)
def test_mg_summary_contract(shard_streams, k):
    """The three MG guarantees q152 outputs as columns, over arbitrary
    sharded streams: <= k counters survive, estimates never overestimate,
    the deficit is within the emitted bound, and every token whose true
    count exceeds the bound is PRESENT (no false-negative heavy hitter)."""
    shard_counts = []
    true: dict = {}
    for stream in shard_streams:
        counts: dict = {}
        for t in stream:
            counts[t] = counts.get(t, 0) + 1
            true[t] = true.get(t, 0) + 1
        shard_counts.append(counts)
    est, bound = _mg_q152(shard_counts, k)
    assert len(est) <= k
    for t, e in est.items():
        assert e <= true[t]
        assert true[t] - e <= bound
    for t, c in true.items():
        if c > bound:
            assert t in est, (t, c, bound)


@given(
    st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=500),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=150, deadline=None)
def test_mg_shard_reduce_is_valid_summary(stream, k):
    """Validity condition from the Mergeable Summaries paper: the order-free
    per-shard reduction's decrement lam satisfies lam <= (n - m_hat)/(k+1),
    i.e. it is a legal MG summary and therefore merge-closed."""
    counts: dict = {}
    for t in stream:
        counts[t] = counts.get(t, 0) + 1
    summ, lam = _mg_reduce(counts, k)
    n = len(stream)
    m_hat = sum(summ.values())
    assert lam * (k + 1) <= n - m_hat


# --- q153: PassJoin segment blocking ----------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _q153_seg(m: int, i: int, k: int):
    """(start0, length) of slot i when a length-m string splits into k
    segments — first k - (m % k) slots get floor(m/k), the rest one more.
    Twin of _q153_seg_start/_q153_seg_len (1-based there)."""
    lb, r = divmod(m, k)
    length = lb + (1 if i >= k - r else 0)
    start = i * lb + max(0, i - (k - r))
    return start, length


def _q153_blocked_candidates(strings, d):
    k = d + 1
    idx = {}
    for s in strings:
        n = len(s)
        if n < k:
            continue
        for i in range(k):
            p, l = _q153_seg(n, i, k)
            idx.setdefault((n, i, s[p:p + l]), set()).add(s)
    cands = set()
    for s in strings:
        n = len(s)
        for m in range(n - d, n + d + 1):
            if m < k:
                continue
            for i in range(k):
                p, l = _q153_seg(m, i, k)
                for ds in range(-d, d + 1):
                    st = p + ds
                    if st < 0 or st + l > n or l < 1:
                        continue
                    for other in idx.get((m, i, s[st:st + l]), ()):
                        if other != s:
                            cands.add((min(s, other), max(s, other)))
    # short path: index strings below k chars, banded by length
    shorts = [s for s in strings if len(s) < k]
    for s in shorts:
        for o in strings:
            if o != s and abs(len(o) - len(s)) <= d:
                cands.add((min(s, o), max(s, o)))
    return cands


@given(
    st.lists(
        st.text(alphabet="ab", min_size=0, max_size=9),
        min_size=2,
        max_size=25,
        unique=True,
    )
)
@settings(max_examples=300, deadline=None)
def test_passjoin_blocking_has_exact_recall(strings):
    """The pigeonhole guarantee q153's parity row rests on: every pair
    within edit distance d shares one index segment verbatim at a start
    shifted by at most d, so the blocked candidate set is a SUPERSET of
    the true pair set. Adversarial alphabet ('ab', lengths 0-9) maximizes
    collisions and boundary cases (empty strings ride the short path)."""
    d = 2
    cands = _q153_blocked_candidates(strings, d)
    for x, y in combinations(sorted(strings), 2):
        if _lev(x, y) <= d:
            assert (x, y) in cands, (x, y, _lev(x, y))


# --- q154: SCD2 gaps-and-islands --------------------------------------------


def _scd2_islands(rows):
    """Twin of q154's island algebra: rows = [(day, key, status)] for ONE
    customer; returns [(status, valid_from, valid_to, n)] ordered."""
    seq = sorted(rows)
    islands = []
    for day, _, status in seq:
        if not islands or islands[-1][0] != status:
            islands.append([status, day, None, 0])
        islands[-1][3] += 1
    for i in range(len(islands) - 1):
        islands[i][2] = islands[i + 1][1]
    return [tuple(x) for x in islands]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=10**6),
            st.sampled_from("OFP"),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda r: r[1],
    )
)
@settings(max_examples=200, deadline=None)
def test_scd2_islands_partition_the_timeline(rows):
    """The SCD2 contracts q154's output is trusted for: island order counts
    sum to the fact count, consecutive islands always change status
    (maximal compression), intervals chain half-open with no gaps
    (valid_to == next valid_from), and exactly one island is current."""
    islands = _scd2_islands(rows)
    assert sum(n for _, _, _, n in islands) == len(rows)
    for (s1, _, t1, _), (s2, f2, _, _) in zip(islands, islands[1:]):
        assert s1 != s2
        assert t1 == f2
    assert [i for i, (_, _, t, _) in enumerate(islands) if t is None] == [
        len(islands) - 1
    ]


# --- q155: grid-cell interval overlap join ----------------------------------


def _grid_overlap_pairs(a_ivals, b_ivals, cell):
    """Twin of q155's grid decomposition: emit covered cells, equi-join on
    cell, keep a pair only in the cell containing max(starts)."""
    from collections import defaultdict

    cells_b = defaultdict(list)
    for j, (bs, be) in enumerate(b_ivals):
        for c in range(bs // cell, (be - 1) // cell + 1):
            cells_b[c].append(j)
    out = set()
    for i, (s, e) in enumerate(a_ivals):
        for c in range(s // cell, (e - 1) // cell + 1):
            for j in cells_b.get(c, ()):
                bs, be = b_ivals[j]
                if s < be and bs < e and c == max(s, bs) // cell:
                    out.add((i, j))
    return out


@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.integers(1, 40)),
        min_size=1, max_size=30,
    ),
    st.lists(
        st.tuples(st.integers(0, 500), st.integers(1, 40)),
        min_size=1, max_size=30,
    ),
    st.integers(min_value=1, max_value=24),
)
@settings(max_examples=300, deadline=None)
def test_grid_overlap_join_is_exact_and_duplicate_free(a_raw, b_raw, cell):
    """q155's count-once-cell rule: the gridded join finds EVERY
    overlapping pair EXACTLY once (set equality vs brute force), for any
    cell size — so its aggregates need no distinct and lose nothing."""
    a = [(s, s + l) for s, l in a_raw]
    b = [(s, s + l) for s, l in b_raw]
    brute = {
        (i, j)
        for i, (s, e) in enumerate(a)
        for j, (bs, be) in enumerate(b)
        if s < be and bs < e
    }
    assert _grid_overlap_pairs(a, b, cell) == brute


# --- q157: association-rule algebra -----------------------------------------


@given(
    st.lists(
        st.sets(st.integers(min_value=0, max_value=7), min_size=1, max_size=5),
        min_size=2,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_association_rule_identities(baskets):
    """The measure algebra q157 emits: lift is symmetric (lift(a->b) ==
    lift(b->a)), confidence(a->b) * supp_a == supp_ab exactly, and
    support/confidence/lift are consistent ratios of the same three
    integer counts."""
    n = len(baskets)
    from collections import Counter

    supp = Counter()
    pair = Counter()
    for b in baskets:
        for x in b:
            supp[x] += 1
        for x in b:
            for y in b:
                if x != y:
                    pair[(x, y)] += 1
    for (a, b), sab in pair.items():
        lift_ab = (sab * n) / (supp[a] * supp[b])
        lift_ba = (pair[(b, a)] * n) / (supp[b] * supp[a])
        assert pair[(b, a)] == sab  # co-occurrence is symmetric
        assert lift_ab == lift_ba
        conf = sab / supp[a]
        # the confidence identity must be checked as INTEGER cross-
        # multiplication: conf·supp_a == sab fails in IEEE whenever
        # sab/supp_a is not dyadic (hypothesis found 13/23·23 ≠ 13) —
        # exactly the float-identity trap the query code avoids
        assert sab <= supp[a]
        assert abs(conf * supp[a] - sab) < 1e-9
        assert 0 < conf <= 1
        assert 0 < sab / n <= 1


# --- q158: k-anonymity generalization ladder ---------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(0, 4),                      # nat
            st.sampled_from("AB"),                  # seg
            st.integers(0, 9999),                   # balance in cents*? use raw
        ),
        min_size=1,
        max_size=120,
    ),
    st.integers(min_value=2, max_value=6),
)
@settings(max_examples=200, deadline=None)
def test_kanonymity_ladder_is_monotone(rows, k):
    """q158's ladder contract: each level's classes are UNIONS of the
    previous level's (bal@100 -> bal@1000 -> dropped -> segment-only), so
    the min class size is nondecreasing and the below-k row mass is
    nonincreasing as generalization coarsens — the property that makes
    'walk the ladder until k-anonymous' a sound procedure."""
    from collections import Counter

    levels = [
        lambda r: (r[0], r[1], r[2] // 100),
        lambda r: (r[0], r[1], r[2] // 1000),
        lambda r: (r[0], r[1]),
        lambda r: (r[1],),
    ]
    prev_min, prev_below = 0, None
    for key in levels:
        sizes = Counter(key(r) for r in rows)
        mn = min(sizes.values())
        below = sum(v for v in sizes.values() if v < k)
        assert mn >= prev_min
        if prev_below is not None:
            assert below <= prev_below
        prev_min, prev_below = mn, below


# --- q159: ECE algebra --------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),  # s_fp
            st.booleans(),
        ),
        min_size=1,
        max_size=300,
    )
)
@settings(max_examples=200, deadline=None)
def test_ece_is_weighted_mean_of_bin_gaps(items):
    """q159's rollup: ECE == sum(n_b/N * |mean_score_b - frac_pos_b|),
    every bin mean lies inside its bin's score range, and ECE is bounded
    by the largest bin gap."""
    from collections import defaultdict

    bins = defaultdict(list)
    for s_fp, y in items:
        bins[min(s_fp // 100000, 9)].append((s_fp, y))
    n_total = len(items)
    ece = 0.0
    max_gap = 0.0
    for b, rows in bins.items():
        n = len(rows)
        mean_s = sum(s for s, _ in rows) / (n * 1e6)
        frac = sum(1 for _, y in rows if y) / n
        gap = abs(mean_s - frac)
        assert b / 10 - 1e-12 <= mean_s <= (b + 1) / 10 + 1e-6 or b == 9
        ece += gap * n / n_total
        max_gap = max(max_gap, gap)
    assert 0.0 <= ece <= max_gap + 1e-12


# --- q160: bilinear delta-join identity --------------------------------------


@given(
    st.lists(st.tuples(st.integers(0, 5), st.integers(1, 100)), max_size=50),
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 3)), max_size=20),
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=200, deadline=None)
def test_delta_join_quadrants_equal_full_join(orders, custs, seed):
    """q160's identity: splitting BOTH join sides into base/delta and
    summing the four quadrant aggregates equals aggregating the full
    join — for any split (here a seeded pseudo-random one), because the
    join is bilinear and the aggregates are algebraic."""
    import random

    rng = random.Random(seed)
    o_split = [rng.randint(0, 1) for _ in orders]
    c_split = [rng.randint(0, 1) for _ in custs]
    full = {}
    for (ok, price) in orders:
        for (ck, nat) in custs:
            if ok == ck:
                n, s = full.get(nat, (0, 0))
                full[nat] = (n + 1, s + price)
    quad = {}
    for so in (0, 1):
        for sc in (0, 1):
            for (ok, price), po in zip(orders, o_split):
                if po != so:
                    continue
                for (ck, nat), pc in zip(custs, c_split):
                    if pc != sc or ok != ck:
                        continue
                    n, s = quad.get(nat, (0, 0))
                    quad[nat] = (n + 1, s + price)
    assert quad == full


# --- q161: bucketed prefix-scan skyline ---------------------------------------


def _skyline_scan(points, n_buckets):
    """Twin of q161's decomposition: distinct points, range-bucket on x,
    per-bucket 1-preceding running min over (x, y) order, cross-bucket
    prefix min; survivor iff both mins exceed y."""
    dpts = sorted(set(points))
    if not dpts:
        return set()
    mn, mx = dpts[0][0], dpts[-1][0]
    span = max(mx - mn, 1)

    def bucket(x):
        return (x - mn) * (n_buckets - 1) // span

    from collections import defaultdict

    per_bucket = defaultdict(list)
    for p in dpts:
        per_bucket[bucket(p[0])].append(p)
    bmins = {b: min(y for _, y in ps) for b, ps in per_bucket.items()}
    sky = set()
    for b, ps in per_bucket.items():
        pmin = min((m for bb, m in bmins.items() if bb < b), default=None)
        run = None
        for x, y in ps:  # already sorted (x, y)
            if (pmin is None or pmin > y) and (run is None or run > y):
                sky.add((x, y))
            run = y if run is None else min(run, y)
    return sky


@given(
    st.lists(
        st.tuples(st.integers(-50, 50), st.integers(-50, 50)),
        min_size=1,
        max_size=80,
    ),
    st.integers(min_value=2, max_value=64),
)
@settings(max_examples=300, deadline=None)
def test_bucketed_skyline_equals_brute_force(points, n_buckets):
    """q161's parity claim as a theorem: the bucketed prefix-scan skyline
    equals the NOT EXISTS brute force for any point multiset (duplicates
    collapse first — equal points never dominate each other) and any
    bucket count."""
    dpts = set(points)
    brute = {
        p
        for p in dpts
        if not any(
            q[0] <= p[0] and q[1] <= p[1] and q != p
            for q in dpts
        )
    }
    assert _skyline_scan(points, n_buckets) == brute


# --- q163: chained BPE merges --------------------------------------------------


def _spaced(w):
    return " " + " ".join(w) + " "


def _bpe_step(spaced_vocab):
    """Twin of one q163 iteration over [(spaced, wc)]: count adjacent
    symbol pairs, merge the argmax (count desc, pair asc) via single-pass
    replace. Returns (new_vocab, pair, pair_count)."""
    from collections import Counter

    pc = Counter()
    for s, wc in spaced_vocab:
        syms = s.split()
        for a, b in zip(syms, syms[1:]):
            pc[f"{a} {b}"] += wc
    if not pc:
        return spaced_vocab, None, 0
    pair, cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
    merged = pair.replace(" ", "")
    out = [(s.replace(f" {pair} ", f" {merged} "), wc) for s, wc in spaced_vocab]
    return out, pair, cnt


@given(
    st.lists(
        st.tuples(st.text(alphabet="abc", min_size=2, max_size=8),
                  st.integers(1, 20)),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=200, deadline=None)
def test_bpe_chained_merges_budget_contract(words):
    """q163's emitted invariants: the corpus symbol budget strictly
    decreases at every merge step, and each step's saving is in
    [1, pair_count] — pair_count alone is an upper bound because
    single-pass replace defers shared-space adjacent repeats (both
    engines behave identically; this pins the twin's algebra)."""
    vocab = [(_spaced(w), wc) for w, wc in words]

    def budget(v):
        return sum(len(s.split()) * wc for s, wc in v)

    prev = budget(vocab)
    for _ in range(3):
        vocab, pair, cnt = _bpe_step(vocab)
        if pair is None:
            break
        now = budget(vocab)
        saved = prev - now
        assert 1 <= saved <= cnt, (pair, cnt, saved)
        prev = now


# --- q165: deterministic random walks ----------------------------------------


def _walk(edges, start, steps):
    """Twin of q165: at step t move from v to the neighbor u minimizing
    (md5('walk:t:v:u'), u)."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    path = [start]
    v = start
    for t in range(1, steps + 1):
        nbrs = adj[v]
        if not nbrs:
            break
        v = min(nbrs, key=lambda u: (_hex8(f"walk:{t}:{v}:{u}"), u))
        path.append(v)
    return path


@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=200, deadline=None)
def test_random_walk_is_deterministic_and_on_graph(edges, seed):
    """q165's contracts: the walk is invariant to edge-list order and
    duplication (the md5 argmin depends only on the neighbor SET — the
    property that makes it reproducible across partitionings), and every
    consecutive path pair is a real edge."""
    import random

    edges = [e for e in edges if e[0] != e[1]]
    if not edges:
        return
    eset = {frozenset(e) for e in edges}
    start = edges[0][0]
    p1 = _walk(edges, start, 3)
    shuffled = edges[:]
    random.Random(seed).shuffle(shuffled)
    p2 = _walk(shuffled + edges[:3], start, 3)  # reorder + duplicates
    assert p1 == p2
    for a, b in zip(p1, p1[1:]):
        assert frozenset((a, b)) in eset


# --- q176: interval-merge compaction planning ------------------------------
def test_compaction_plan_matches_python_sweep_twin(spark, sf_dir):
    """q176 vs a from-scratch python twin: rebuild both manifest
    generations (ntile quartiles + hash-sampled stride-restricted gen1
    files) and re-run the interval sweep in plain python, then compare
    the full task table. Also pins the planner's soundness contract:
    tasks within a source cover disjoint, ordered key ranges, and
    singleton tasks are flagged pass-through."""
    import hashlib
    from collections import defaultdict

    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        _Q176_GEN0_FILES,
        _Q176_GEN1_DOCS,
        _Q176_SAMPLE_MOD,
        _Q176_STRIDE,
        q176_compaction_plan,
    )

    got = [
        (r.source, r.group_id, r.n_files, r.total_bytes, r.total_docs,
         r.key_lo, r.key_hi, r.needs_compaction)
        for r in q176_compaction_plan(spark, sf_dir).collect()
    ]

    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "n_chars").collect()
    )
    by_src = defaultdict(list)
    for r in rows:
        by_src[r.source].append((r.doc_id, r.n_chars))
    expected = []
    for src in sorted(by_src):
        docs = sorted(by_src[src])
        files = []
        # gen0: ntile(4) — first (n % 4) buckets get the extra row
        n = len(docs)
        q, rem = divmod(n, _Q176_GEN0_FILES)
        start = 0
        for i in range(_Q176_GEN0_FILES):
            size = q + (1 if i < rem else 0)
            part = docs[start:start + size]
            start += size
            if part:
                files.append((part[0][0], part[-1][0], sum(c for _, c in part),
                              len(part), 0, i + 1))
        sampled = [
            (d, c) for d, c in docs
            if int(hashlib.md5(f"cmpct:{d}".encode()).hexdigest()[:8], 16)
               % _Q176_SAMPLE_MOD == 0 and (d // _Q176_STRIDE) % 2 == 0
        ]
        for i in range(0, len(sampled), _Q176_GEN1_DOCS):
            part = sampled[i:i + _Q176_GEN1_DOCS]
            files.append((part[0][0], part[-1][0], sum(c for _, c in part),
                          len(part), 1, i // _Q176_GEN1_DOCS + 1))
        files.sort(key=lambda f: (f[0], f[1], f[4], f[5]))
        gid, run_max = 0, None
        groups = defaultdict(list)
        for f in files:
            if run_max is None or f[0] > run_max:
                gid += 1
            run_max = f[1] if run_max is None else max(run_max, f[1])
            groups[gid].append(f)
        for g in sorted(groups):
            fs = groups[g]
            expected.append((src, g, len(fs), sum(f[2] for f in fs),
                             sum(f[3] for f in fs), min(f[0] for f in fs),
                             max(f[1] for f in fs), len(fs) > 1))
    assert got == expected

    # soundness: disjoint ordered ranges per source
    prev = {}
    for src, gid, n_files, _b, _d, lo, hi, needs in got:
        assert lo <= hi and (n_files > 1) == needs
        if src in prev:
            assert lo > prev[src]
        prev[src] = hi
