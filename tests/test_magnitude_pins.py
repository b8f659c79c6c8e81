"""Magnitude pins for textbook ports (VERDICT r8 item #4) — no Spark.

Three shared-convention bugs in three rounds (AD's l/N weight, chi2's
structural zeros, Burrows' population sd) proved that engine==oracle==
test-reference equality cannot catch a convention error all three share.
These tests pin the NULL-HYPOTHESIS MAGNITUDE of each remaining textbook
port against an independent derivation: pure-python mirrors of the exact
cell algebra the Spark code and the oracle both implement, checked
against the statistic's known H0 value / hand-computed recursions.

Mirrored formulas (kept in lockstep with the engine):
 - benford_from_cells   (analytics.py): leading digit of the integer
   cent count's string head, share vs log10(1+1/d)
 - psi_from_histogram   (analytics.py): add-one smoothed two-sided PSI
   on the global bucket spine, p=(c+1)/(n+B)
 - mi_from_cells        (analytics.py): MI = sum (o/n)*ln(o*n/(rt*ct))
   over observed cells + marginal entropies + NMI
 - holt_from_daily      (analytics.py): l_t = a*y + (1-a)*(l+b),
   b_t = beta*(l_t - l) + (1-beta)*b, l_0 = y_0, b_0 = 0
 - ewma_smooth          (analytics.py): s_1 = x_1,
   s_t = alpha*x_t + (1-alpha)*s_{t-1}
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# Benford — benford_from_cells mirror
# ---------------------------------------------------------------------------

BENFORD_P = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def _benford_mirror(cent_counts):
    """Mirror of benford_from_cells over (cents, c) pairs: leading digit
    from the positive integer cent count's string head, exact integer
    digit counts, share = n_obs / total."""
    digit_n = Counter()
    for cents, c in cent_counts:
        if cents > 0:
            digit_n[int(str(cents)[0])] += c
    tn = sum(digit_n.values())
    return {
        d: {
            "n_obs": n,
            "share": n / tn,
            "excess": n / tn - BENFORD_P[d],
        }
        for d, n in digit_n.items()
    }


def test_benford_constants_are_the_exact_h0_distribution():
    # the engine's p_map literals ARE log10(1+1/d); they sum to exactly
    # the probability of "some leading digit" = 1
    assert abs(sum(BENFORD_P.values()) - 1.0) < 1e-12
    assert abs(BENFORD_P[1] - 0.30102999566398120) < 1e-15
    assert abs(BENFORD_P[9] - 0.04575749056067514) < 1e-15


def test_benford_log_uniform_sample_matches_h0_magnitude():
    # a log-uniform positive sample is the Benford H0: leading-digit
    # shares must land ON log10(1+1/d), not at a multiple of it (the
    # AD-bug class would show up as a constant-factor offset here).
    n = 60000
    cents = [int(10 ** (2 + 4 * i / n)) for i in range(n)]
    rep = _benford_mirror([(v, 1) for v in cents])
    assert set(rep) == set(range(1, 10))
    worst = max(abs(rep[d]["excess"]) for d in range(1, 10))
    assert worst < 0.005, f"log-uniform excess {worst} off Benford H0"


def test_benford_degenerate_sample_pins_the_excess_scale():
    # all mass on one value: share(digit)=1, excess = 1 - p_d exactly;
    # every other digit absent (contributes no row, the engine drops it)
    rep = _benford_mirror([(725, 40)])
    assert list(rep) == [7]
    assert rep[7]["n_obs"] == 40
    assert rep[7]["share"] == 1.0
    assert abs(rep[7]["excess"] - (1.0 - BENFORD_P[7])) < 1e-15


@given(
    st.lists(
        st.tuples(st.integers(min_value=-500, max_value=99999),
                  st.integers(min_value=1, max_value=20)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_benford_shares_partition_unity(cells):
    rep = _benford_mirror(cells)
    if not rep:  # all non-positive — engine emits no rows for the group
        assert all(v <= 0 for v, _ in cells)
        return
    assert abs(sum(r["share"] for r in rep.values()) - 1.0) < 1e-12
    # share - p identity: excess is never computed from a second path
    for d, r in rep.items():
        assert r["excess"] == r["share"] - BENFORD_P[d]


# ---------------------------------------------------------------------------
# PSI — psi_from_histogram mirror
# ---------------------------------------------------------------------------


def _psi_mirror(group_hist, rest_hist):
    """Mirror of psi_from_histogram for ONE group vs its complement:
    add-one smoothing over the union bucket spine, term-by-term
    (p_a - p_r) * ln(p_a / p_r), bucket-sorted sum."""
    spine = sorted(set(group_hist) | set(rest_hist))
    bb = len(spine)
    na = sum(group_hist.values())
    nr = sum(rest_hist.values())
    psi = 0.0
    for bkt in spine:
        ca = group_hist.get(bkt, 0)
        cr = rest_hist.get(bkt, 0)
        pa = (ca + 1) / (na + bb)
        pr = (cr + 1) / (nr + bb)
        psi += (pa - pr) * math.log(pa / pr)
    return psi


def test_psi_identical_distributions_is_exactly_zero():
    # identical histograms => p_a == p_r per bucket => every term is
    # exactly (0.0)*ln(1.0) = 0.0 — no float residue, PSI == 0.0
    h = {0: 7, 1: 13, 3: 2, 9: 41}
    assert _psi_mirror(h, dict(h)) == 0.0


def test_psi_two_bucket_hand_case():
    # group: 90/10 over two buckets, rest: 10/90, add-one smoothing,
    # B=2, n=100 each: p_a = 91/102, 11/102; p_r = 11/102, 91/102.
    pa1, pa2 = 91 / 102, 11 / 102
    want = (pa1 - pa2) * math.log(pa1 / pa2) + (pa2 - pa1) * math.log(
        pa2 / pa1
    )
    got = _psi_mirror({0: 90, 1: 10}, {0: 10, 1: 90})
    assert got == want
    # magnitude: this is a textbook "major shift" (>> 0.25)
    assert 3.0 < got < 4.0


@given(
    st.dictionaries(st.integers(0, 8), st.integers(0, 50), max_size=9),
    st.dictionaries(st.integers(0, 8), st.integers(0, 50), max_size=9),
)
@settings(max_examples=300, deadline=None)
def test_psi_is_nonnegative(ha, hb):
    # each term (p-q)ln(p/q) >= 0: sign(p-q) == sign(ln(p/q)); add-one
    # smoothing keeps every p, q > 0 even on empty inputs
    assert _psi_mirror(ha, hb) >= -1e-12


# ---------------------------------------------------------------------------
# MI — mi_from_cells mirror
# ---------------------------------------------------------------------------


def _mi_mirror(cells):
    """Mirror of mi_from_cells over {(r, c): o} observed cells: MI in
    nats over observed cells, both marginal entropies, NMI (None when
    either margin is degenerate)."""
    rt = Counter()
    ct = Counter()
    for (r, c), o in cells.items():
        rt[r] += o
        ct[c] += o
    tn = sum(cells.values())
    mi = sum(
        (o / tn) * math.log(o * tn / (rt[r] * ct[c]))
        for (r, c), o in sorted(cells.items())
    )
    h_r = sum(-(v / tn) * math.log(v / tn) for v in rt.values())
    h_c = sum(-(v / tn) * math.log(v / tn) for v in ct.values())
    nmi = mi / math.sqrt(h_r * h_c) if h_r > 0 and h_c > 0 else None
    return mi, h_r, h_c, nmi


def test_mi_outer_product_table_is_exactly_zero():
    # independence H0: o_rc = a_r * b_c => o*tn == rt*ct EXACTLY in
    # integers => every log argument is exactly 1.0 => MI == 0.0
    # (chi2 has this pin already; MI's own test now does too)
    a = {"x": 3, "y": 5, "z": 2}
    b = {"u": 4, "v": 7}
    cells = {(r, c): a[r] * b[c] for r in a for c in b}
    mi, h_r, h_c, nmi = _mi_mirror(cells)
    assert mi == 0.0
    assert nmi == 0.0
    assert h_r > 0 and h_c > 0


def test_mi_perfect_dependence_equals_marginal_entropy():
    # diagonal table: knowing the row IS knowing the column =>
    # MI = H_row = H_col, NMI = 1
    cells = {(0, 0): 2, (1, 1): 5, (2, 2): 3}
    mi, h_r, h_c, nmi = _mi_mirror(cells)
    assert abs(mi - h_r) < 1e-12
    assert abs(mi - h_c) < 1e-12
    assert abs(nmi - 1.0) < 1e-12


def test_mi_2x2_hand_case():
    # [[3, 1], [1, 3]]: tn=8, margins all 4; MI from the definition
    cells = {(0, 0): 3, (0, 1): 1, (1, 0): 1, (1, 1): 3}
    mi, h_r, h_c, _ = _mi_mirror(cells)
    want = 2 * (3 / 8) * math.log(3 * 8 / 16) + 2 * (1 / 8) * math.log(
        1 * 8 / 16
    )
    assert abs(mi - want) < 1e-15
    assert abs(h_r - math.log(2)) < 1e-12
    assert abs(h_c - math.log(2)) < 1e-12


@given(
    st.dictionaries(
        st.tuples(st.integers(0, 3), st.integers(0, 3)),
        st.integers(1, 30),
        min_size=1,
        max_size=16,
    )
)
@settings(max_examples=300, deadline=None)
def test_mi_bounded_by_marginal_entropies(cells):
    mi, h_r, h_c, nmi = _mi_mirror(cells)
    assert mi >= -1e-9
    assert mi <= min(h_r, h_c) + 1e-9
    if nmi is not None:
        assert -1e-9 <= nmi <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# Holt + EWMA — fold mirrors vs hand recursion
# ---------------------------------------------------------------------------


def _holt_mirror(ys, alpha, beta):
    """Mirror of holt_from_daily's struct fold: identical op order
    (l_new inlined into both updates on the engine — one expression,
    so computing it once here yields the same double)."""
    level, trend = ys[0], 0.0
    for y in ys[1:]:
        l_new = alpha * y + (1.0 - alpha) * (level + trend)
        trend = beta * (l_new - level) + (1.0 - beta) * trend
        level = l_new
    return level, trend


def _ewma_mirror(xs, alpha):
    beta = 1.0 - alpha  # computed ONCE, as the engine does
    s = xs[0]
    for x in xs[1:]:
        s = alpha * x + beta * s
    return s


def test_holt_three_step_hand_recursion():
    # y = [10, 16, 13], alpha=0.5, beta=0.3 — every intermediate
    # written out by hand:
    #   t1: l=10, b=0
    #   t2: l = .5*16 + .5*(10+0)  = 13;   b = .3*(13-10) + .7*0    = 0.9
    #   t3: l = .5*13 + .5*(13.9)  = 13.45; b = .3*(13.45-13)+.7*.9 = 0.765
    level, trend = _holt_mirror([10.0, 16.0, 13.0], 0.5, 0.3)
    assert level == 13.45
    # 0.3 is inexact in binary: the fold's trend carries ~2 ulp residue
    assert abs(trend - 0.765) < 1e-12
    # forecast = level + trend, the engine's one-step-ahead readout
    # (14.215 up to one double addition's rounding)
    assert abs(level + trend - 14.215) < 1e-12


def test_holt_constant_series_is_a_fixed_point():
    level, trend = _holt_mirror([7.25] * 12, 0.5, 0.3)
    assert level == 7.25
    assert trend == 0.0


def test_holt_alpha_one_tracks_last_value():
    # alpha=1: l_t = y_t exactly; trend = smoothed day-over-day diff
    level, trend = _holt_mirror([3.0, 9.0, 4.0], 1.0, 0.5)
    assert level == 4.0
    assert trend == 0.5 * (4.0 - 9.0) + 0.5 * (0.5 * (9.0 - 3.0) + 0.0)


def test_ewma_three_step_hand_recursion():
    # x = [10, 20, 30], alpha=0.3:
    #   s1 = 10; s2 = .3*20 + .7*10 = 13; s3 = .3*30 + .7*13 = 18.1
    s = _ewma_mirror([10.0, 20.0, 30.0], 0.3)
    assert s == 0.3 * 30.0 + (1.0 - 0.3) * (0.3 * 20.0 + (1.0 - 0.3) * 10.0)
    assert abs(s - 18.1) < 1e-12


def test_ewma_constant_series_is_a_fixed_point():
    assert _ewma_mirror([4.5] * 20, 0.3) == 4.5


@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=1,
        max_size=40,
    ),
    st.floats(min_value=0.05, max_value=1.0, allow_nan=False),
)
@settings(max_examples=300, deadline=None)
def test_ewma_stays_inside_the_data_envelope(xs, alpha):
    # a convex-combination recursion can never escape [min, max]
    s = _ewma_mirror(xs, alpha)
    assert min(xs) - 1e-9 <= s <= max(xs) + 1e-9
