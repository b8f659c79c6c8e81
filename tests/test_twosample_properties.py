"""Property-based tests (hypothesis) for the pure integer cores of the
two-sample/rank statistics — no Spark session: these drive the numpy
Knight machinery (`analytics._knight_counts`) and pure-python mirrors
of the cell-table formulations against brute-force O(n²) pair loops on
arbitrary tie-heavy data.  The Spark-side tests pin fixed points and
oracle parity; these pin the ALGEBRA on thousands of random shapes."""

from __future__ import annotations

import itertools
import math
from collections import Counter

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from streamkit_spark.functions.analytics import (
    _count_inversions,
    _knight_counts,
    _run_tie_pairs,
)

# tie-heavy by construction: small value domains force every tie path
vals = st.integers(min_value=-5, max_value=5)
pairs_lists = st.lists(st.tuples(vals, vals), min_size=0, max_size=60)


@given(st.lists(vals, min_size=0, max_size=80))
@settings(max_examples=300, deadline=None)
def test_inversion_count_matches_brute_force(ys):
    arr = np.array(ys, dtype=np.int64)
    brute = sum(
        1 for i, j in itertools.combinations(range(len(ys)), 2)
        if ys[i] > ys[j]
    )
    assert _count_inversions(arr) == brute


@given(st.lists(vals, min_size=0, max_size=80))
@settings(max_examples=300, deadline=None)
def test_run_tie_pairs_matches_counter(ys):
    arr = np.sort(np.array(ys, dtype=np.int64), kind="stable")
    want = sum(c * (c - 1) // 2 for c in Counter(ys).values())
    assert _run_tie_pairs(arr) == want


@given(pairs_lists)
@settings(max_examples=300, deadline=None)
def test_knight_counts_match_brute_pair_loop(pts):
    xs = np.array([p[0] for p in pts], dtype=np.int64)
    ys = np.array([p[1] for p in pts], dtype=np.int64)
    c, d, n0, n1, n2 = _knight_counts(xs, ys)
    bc = bd = bt1 = bt2 = 0
    for (x1, y1), (x2, y2) in itertools.combinations(pts, 2):
        if x1 == x2:
            bt1 += 1
        if y1 == y2:
            bt2 += 1
        if x1 != x2 and y1 != y2:
            if (x1 < x2) == (y1 < y2):
                bc += 1
            else:
                bd += 1
    n = len(pts)
    assert (c, d) == (bc, bd)
    assert n0 == n * (n - 1) // 2
    assert (n1, n2) == (bt1, bt2)
    # conservation: every pair is concordant, discordant, or tied
    joint = sum(
        1 for (x1, y1), (x2, y2) in itertools.combinations(pts, 2)
        if x1 == x2 and y1 == y2
    )
    assert c + d + n1 + n2 - joint == n0


def _ref_two_sample(xs, ys):
    """Brute references for KS D, CvM W², AD A²akN, Cliff's δ over two
    samples — straight from the textbook definitions."""
    n1, n2 = len(xs), len(ys)
    nn = n1 + n2
    cx, cy = Counter(xs), Counter(ys)
    pooled = sorted(set(xs) | set(ys))
    # KS / CvM over right-continuous CDFs
    d_max = 0.0
    w2 = 0.0
    c1 = c2 = 0
    for v in pooled:
        c1 += cx.get(v, 0)
        c2 += cy.get(v, 0)
        l = cx.get(v, 0) + cy.get(v, 0)
        gap = abs(c1 / n1 - c2 / n2)
        d_max = max(d_max, gap)
        w2 += l * (c1 / n1 - c2 / n2) ** 2
    w2 *= n1 * n2 / nn**2
    # AD midrank (Scholz-Stephens eq. 7)
    sx = sy = 0.0
    cumx = cumy = cump = 0
    for v in pooled:
        lx, ly = cx.get(v, 0), cy.get(v, 0)
        l = lx + ly
        mx, my = cumx + lx / 2, cumy + ly / 2
        bj = cump + l / 2
        den = bj * (nn - bj) - nn * l / 4
        if den > 0:
            sx += (l / nn) * (nn * mx - n1 * bj) ** 2 / den
            sy += (l / nn) * (nn * my - n2 * bj) ** 2 / den
        cumx, cumy, cump = cumx + lx, cumy + ly, cump + l
    a2 = (nn - 1) / nn * (sx / n1 + sy / n2)
    # Cliff's delta
    gt = sum(1 for x in xs for y in ys if x > y)
    lt = sum(1 for x in xs for y in ys if x < y)
    delta = (gt - lt) / (n1 * n2)
    return d_max, w2, a2, delta


def _cells_two_sample(xs, ys):
    """Pure-python mirror of the engine's CELL-TABLE integer cores
    (ks/cvm/ad_from_cells over _cdf_grid, cliffs via _ranksum_parts) —
    the same doubled-midrank / cum-count arithmetic, no Spark."""
    n1, n2 = len(xs), len(ys)
    nn = n1 + n2
    cx = Counter(xs)
    call = Counter(xs) + Counter(ys)
    pooled = sorted(call)
    cum1 = cump = 0
    dnum_max = 0
    s_cvm = 0.0
    s_ad = 0.0
    for v in pooled:
        cf = cx.get(v, 0)
        l = call[v]
        m2 = 2 * cum1 + cf          # doubled group midrank count
        b2 = 2 * cump + l           # doubled pooled midrank count
        cum1 += cf
        cump += l
        # KS: exact integer |cum1·n2 − cum2·n1|
        dnum = abs(cum1 * n2 - (cump - cum1) * n1)
        dnum_max = max(dnum_max, dnum)
        # CvM: same D, squared, weighted by l
        s_cvm += l * float(cum1 * n2 - (cump - cum1) * n1) ** 2
        # AD: doubled-midrank integers T and D2
        t = nn * m2 - n1 * b2
        d2 = b2 * (2 * nn - b2) - nn * l
        if d2 > 0:
            s_ad += l * float(t) ** 2 / d2
    ks = dnum_max / (n1 * n2)
    w2 = s_cvm / (n1 * n2 * nn * nn)
    sn = s_ad / nn
    a2 = (nn - 1) / nn * (sn / n1 + sn / n2)
    # Cliff via doubled average ranks (the _ranksum_parts algebra)
    cum = 0
    r2 = 0
    for v in pooled:
        t_all = call[v]
        dr = 2 * cum + t_all + 1
        r2 += cx.get(v, 0) * dr
        cum += t_all
    u2 = r2 - n1 * (n1 + 1)
    delta = (u2 - n1 * n2) / (n1 * n2)
    return ks, w2, a2, delta


@given(
    st.lists(vals, min_size=1, max_size=40),
    st.lists(vals, min_size=1, max_size=40),
)
@settings(max_examples=300, deadline=None)
def test_cell_table_cores_match_textbook_definitions(xs, ys):
    """The engine's integer-core formulations (cum counts, doubled
    midranks, doubled ranks) equal the textbook CDF/midrank/dominance
    definitions on arbitrary tie-heavy samples — the algebra the
    Spark and oracle implementations both encode."""
    ks_r, w2_r, a2_r, dl_r = _ref_two_sample(xs, ys)
    ks_c, w2_c, a2_c, dl_c = _cells_two_sample(xs, ys)
    assert math.isclose(ks_c, ks_r, abs_tol=1e-12)
    assert math.isclose(w2_c, w2_r, rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(a2_c, a2_r, rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(dl_c, dl_r, abs_tol=1e-12)
