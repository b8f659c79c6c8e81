

# ---------------------------------------------------------------------------
# Monroe log-odds ("Fightin' Words") + Hill diversity (r11)
# ---------------------------------------------------------------------------

def _lo_ref(rows, alpha0=100.0, top_k=5):
    """Pure-python Monroe et al. 2008 §3.5.2 mirror."""
    import math

    cells: dict[tuple[str, str], int] = {}
    for g, text in rows:
        for w in text.split():
            cells[(g, w)] = cells.get((g, w), 0) + 1
    ct: dict[str, int] = {}
    ng: dict[str, int] = {}
    for (g, w), c in cells.items():
        ct[w] = ct.get(w, 0) + c
        ng[g] = ng.get(g, 0) + c
    nn = sum(ng.values())
    out = []
    for (g, w), c in cells.items():
        aw = alpha0 * ct[w] / nn
        y, yc = c, ct[w] - c
        n_g, n_c = ng[g], nn - ng[g]
        delta = math.log((y + aw) / (n_g + alpha0 - y - aw)) - math.log(
            (yc + aw) / (n_c + alpha0 - yc - aw)
        )
        z = delta / math.sqrt(1 / (y + aw) + 1 / (yc + aw))
        out.append((g, w, round(z, 4)))
    res = {}
    for g in ng:
        rows_g = sorted(
            [(z, w) for gg, w, z in out if gg == g],
            key=lambda t: (-t[0], t[1]),
        )[:top_k]
        res[g] = [(w, z) for z, w in rows_g]
    return res


def test_log_odds_matches_python_reference(spark):
    from streamkit_spark.functions.text import log_odds_by_group

    rows = [
        ("a", "spark spark spark merge table dup"),
        ("a", "spark merge key agg row"),
        ("b", "table table table scan scan filter"),
        ("b", "scan filter merge row value"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got: dict = {}
    for r in log_odds_by_group(df, "source", top_k=3).collect():
        got.setdefault(r["source"], []).append((r["token"], r["z"]))
    ref = _lo_ref(rows, top_k=3)
    for g in ref:
        assert [w for w, _ in got[g]] == [w for w, _ in ref[g]], g
        for (w1, z1), (w2, z2) in zip(got[g], ref[g]):
            # python round() is half-even, Spark's HALF_UP: a 5th
            # decimal on the .00005 boundary differs by exactly 1e-4
            # (the r7 kendall lesson) — tolerance must cover it
            assert abs(z1 - z2) < 1.1e-4, (g, w1, z1, z2)
    # two-group antisymmetry: a token's z in group a == -z in group b
    full = {}
    for r in log_odds_by_group(df, "source", top_k=100).collect():
        full[(r["source"], r["token"])] = r["z"]
    for (g, w), z in full.items():
        other = ("b" if g == "a" else "a", w)
        if other in full:
            assert abs(z + full[other]) < 2e-4, (w, z, full[other])
    # the exclusive heavy token tops its group
    assert got["a"][0][0] == "spark"


def test_log_odds_h0_small(spark):
    """Identical group distributions: every z is ~0 (no token 'defines'
    either group)."""
    from streamkit_spark.functions.text import log_odds_by_group

    text = "spark merge table scan row key"
    df = spark.createDataFrame(
        [("a", text), ("b", text)], "source string, text string"
    )
    for r in log_odds_by_group(df, "source", top_k=100).collect():
        assert abs(r["z"]) < 1e-9, dict(r)


def test_diversity_uniform_and_degenerate(spark):
    from streamkit_spark.functions.text import token_diversity_by_group

    rows = [
        ("u", "a b c d e"),           # uniform over 5 -> all Hill = 5
        ("s", "a a a a a"),           # single type
        ("c", "a a a a a a b c"),     # concentrated head
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r["source"]: r for r in
           token_diversity_by_group(df, "source").collect()}
    u = got["u"]
    assert u["richness"] == 5 and u["hill1"] == 5.0
    assert u["hill2"] == 5.0 and u["evenness"] == 1.0
    s = got["s"]
    assert s["richness"] == 1 and s["hill1"] == 1.0 and s["hill2"] == 1.0
    assert s["evenness"] is None
    c = got["c"]
    # Hill spectrum inequality: richness >= hill1 >= hill2 (strict when
    # the distribution is uneven)
    assert c["richness"] > c["hill1"] > c["hill2"] > 1.0
    # python mirror
    import math

    ps = [6 / 8, 1 / 8, 1 / 8]
    h = -sum(p * math.log(p) for p in ps)
    assert abs(c["hill1"] - round(math.exp(h), 4)) < 1e-9
    assert abs(c["hill2"] - round(64 / 38, 4)) < 1e-9
