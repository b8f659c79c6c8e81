"""Event-sourcing fold, multimodal plumbing, and physical-plan assertions."""

from __future__ import annotations

import json

import pytest

from streamkit_spark import plans
from streamkit_spark import tables
from streamkit_spark.es import envelope, load_events, rehydrate_all, save_events
from streamkit_spark.errors import SequenceMismatchError
from streamkit_spark.functions import multimodal as MM
from streamkit_spark.operators.produce import Store


# ----------------------------------------------------------------- eskit

@pytest.fixture()
def bank(spark, tmp_path):
    """A tiny event-sourced domain: accounts with deposit/withdraw."""
    store = Store(spark, str(tmp_path / "store"))
    save_events(store, "accounts", "acc-1", 0,
                [("opened", {"owner": "ada"}), ("deposit", {"amount": 100})],
                now_ms=1)
    save_events(store, "accounts", "acc-1", 2,
                [("withdraw", {"amount": 30})], now_ms=2)
    save_events(store, "accounts", "acc-2", 0,
                [("opened", {"owner": "bob"}), ("deposit", {"amount": 7})],
                now_ms=3)
    return store


def test_load_events_decodes_ordered(bank):
    ev = load_events(bank, "accounts", "acc-1").collect()
    assert [r["version"] for r in ev] == [1, 2, 3]
    assert [r["event_type"] for r in ev] == ["opened", "deposit", "withdraw"]
    assert json.loads(ev[1]["event_data"]) == {"amount": 100}


def test_save_events_optimistic_conflict(bank):
    with pytest.raises(SequenceMismatchError):
        save_events(bank, "accounts", "acc-1", 1, [("deposit", {"amount": 5})])


def test_rehydrate_all_folds_every_aggregate(bank):
    def fold(agg_id, events):
        bal, owner = 0, None
        for et, data in events:
            d = json.loads(data)
            if et == "opened":
                owner = d["owner"]
            elif et == "deposit":
                bal += d["amount"]
            elif et == "withdraw":
                bal -= d["amount"]
        return {"aggregate_id": agg_id, "owner": owner, "balance": bal}

    out = {
        r["aggregate_id"]: (r["owner"], r["balance"])
        for r in rehydrate_all(
            bank, "accounts", fold, "aggregate_id string, owner string, balance long"
        ).collect()
    }
    assert out == {"acc-1": ("ada", 70), "acc-2": ("bob", 7)}


# ------------------------------------------------------------ multimodal

def _media_df(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes", "image/png", (64, 48, None, None)),
        (2, "audio", b"RIFF fake wav", "audio/wav", (None, None, 2500, 16000)),
        (3, "video", b"\x00\x00ftyp fake", "video/mp4", (1920, 1080, 3500, None)),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_fake_decode_pipeline_shapes(spark):
    df = _media_df(spark)
    feats = MM.extract_features(df, MM.fake_decode).collect()
    assert len(feats) == 3
    for r in feats:
        assert len(r["feature"]) == 8 and r["n_bytes"] > 0
    # deterministic across runs
    again = MM.extract_features(df, MM.fake_decode).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, again))


def test_real_decode_is_stubbed(spark):
    df = _media_df(spark)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        MM.extract_features(df, None).collect()


def test_frame_sample_plan(spark):
    df = _media_df(spark)
    frames = MM.frame_sample_plan(df, every_ms=1000).collect()
    assert [(r["media_id"], r["frame_ts_ms"]) for r in frames] == [
        (3, 0), (3, 1000), (3, 2000), (3, 3000)
    ]


def test_media_stats_no_python(spark):
    df = _media_df(spark)
    stats = {r["kind"]: r["n"] for r in MM.media_stats(df).collect()}
    assert stats == {"image": 1, "audio": 1, "video": 1}


def test_fake_resize_pipeline_shapes(spark):
    df = _media_df(spark)
    out = {r["media_id"]: r for r in MM.resize_media(df, 4, 3, MM.fake_resize).collect()}
    assert len(out) == 3
    for r in out.values():
        assert r["n_bytes_out"] == 4 * 3 == len(r["content"])
        assert (r["width"], r["height"]) == (4, 3)
        assert r["n_bytes_in"] > 0
    # deterministic stride sample keeps first byte
    assert out[1]["content"][0] == 0x89
    # real-codec path stays stubbed
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        MM.resize_media(df, 4, 3, None).collect()


# ----------------------------------------------------------------- plans

def test_consume_segment_pushes_predicates(spark):
    from streamkit_spark.operators.consume import ConsumeBounds, consume_segment
    from streamkit_spark.schema import FIXTURE_BINDING

    ev = tables.load(spark, "/root/testdata/sf0.001", "events")
    df = consume_segment(
        ev, "click", 3, ConsumeBounds(min_sequence=50, max_sequence=500),
        binding=FIXTURE_BINDING,
    )
    plans.assert_pushed_filters(
        df,
        "EqualTo(event_type,click)",
        "GreaterThanOrEqual(event_id,50)",
        "LessThanOrEqual(event_id,500)",
    )


def test_inventory_projection_prunes_columns(spark):
    from streamkit_spark.operators.status import get_spaces
    from streamkit_spark.schema import FIXTURE_BINDING

    ev = tables.load(spark, "/root/testdata/sf0.001", "events")
    schemas = plans.read_schemas(get_spaces(ev, binding=FIXTURE_BINDING))
    assert schemas and all("event_type" in s and "value" not in s for s in schemas)


def test_small_dim_join_broadcasts(spark):
    import __spark_entry__ as E

    df = E.q_tpch_q5_region_revenue(spark, "/root/testdata/sf0.001")
    assert plans.has_broadcast_join(df)


def test_map_only_ops_have_no_shuffle(spark):
    from streamkit_spark.functions import text as TX

    docs = tables.load(spark, "/root/testdata/sf0.001", "documents")
    plans.assert_no_exchange(TX.text_stats(docs))
