"""BandTags + ObjectLocation semantics ported from the reference tests
(band_tags.py:60-377, object_location.py:54-233)."""

import pytest

from geografir_ray.functions.bandtags import BandTags
from geografir_ray.state.object_location import ObjectLocation


# --- BandTags -----------------------------------------------------------


def test_bandtags_validation():
    with pytest.raises(ValueError, match="is not a positive integer"):
        BandTags({0: {"a": "b"}})
    with pytest.raises(ValueError, match="is not a positive integer"):
        BandTags({-1: {"a": "b"}})
    BandTags({})  # empty ok


def test_bandtags_immutability_deepcopy():
    src = {1: {"classification": "red"}}
    bt = BandTags(src)
    src[1]["classification"] = "mutated"
    assert bt.get_band_tags(1) == {"classification": "red"}
    got = bt.get_band_tags(1)
    got["classification"] = "mutated-too"
    assert bt.get_band_tags(1) == {"classification": "red"}


def test_bandtags_band_indices_and_names():
    bt = BandTags({1: {"classification": "red"}, 2: {"classification": "orange", "tree": "maple"}})
    assert bt.band_indices == {1, 2}
    assert bt.tag_names == {"classification", "tree"}


def test_bandtags_tags_by_band_last_wins():
    # duplicate value across bands: LAST band wins (band_tags.py:170)
    bt = BandTags({1: {"classification": "red"}, 2: {"classification": "red"}})
    assert bt.tags_by_band == {"classification": {"red": 2}}


def test_bandtags_get_unknown_band():
    assert BandTags({1: {"a": "b"}}).get_band_tags(9) == {}


def test_bandtags_update_returns_new_merged():
    bt = BandTags({1: {"a": "b"}})
    bt2 = bt.update_band_tags(1, {"c": "d"})
    bt3 = bt.update_band_tags(2, {"x": "y"})
    assert bt.get_band_tags(1) == {"a": "b"}  # original untouched
    assert bt2.get_band_tags(1) == {"a": "b", "c": "d"}
    assert bt3.band_indices == {1, 2}


def test_bandtags_kv_roundtrip():
    bt = BandTags({1: {"classification": "red"}, 2: {"tree": "maple"}})
    back = BandTags.from_kv_metadata(bt.to_kv_metadata())
    assert back == bt
    assert BandTags.from_kv_metadata(None) == BandTags({})
    assert BandTags.from_kv_metadata({b"other": b"x"}) == BandTags({})


# --- ObjectLocation (test_object_location.py semantics) ------------------


def test_is_directory():
    assert ObjectLocation(bucket="b", path="x/").is_directory
    assert not ObjectLocation(bucket="b", path="x").is_directory


def test_s3_uri_and_str():
    loc = ObjectLocation(bucket="analytics", path="reports/2024/q1.json")
    assert loc.s3_uri == "s3://analytics/reports/2024/q1.json"
    assert str(loc) == loc.s3_uri


@pytest.mark.parametrize(
    "base,part,expected",
    [
        ("data", "processed/results.json", "data/processed/results.json"),
        ("2024/", "january/reports.zip", "2024/january/reports.zip"),
        ("src", "/lead-slash.py", "src/lead-slash.py"),
    ],
)
def test_extend(base, part, expected):
    assert ObjectLocation(bucket="b", path=base).extend(part).path == expected


def test_from_s3_uri_roundtrip():
    loc = ObjectLocation.from_s3_uri("s3://backup/daily/")
    assert loc.bucket == "backup" and loc.path == "daily/"
    assert loc.is_directory


def test_from_s3_uri_rejects_non_s3():
    with pytest.raises(Exception, match="must begin with 's3'"):
        ObjectLocation.from_s3_uri("http://bucket/path")


def test_from_s3_uri_rejects_double_slash():
    with pytest.raises(ValueError, match="contains `//` in its path portion"):
        ObjectLocation.from_s3_uri("s3://bucket/a//b")


def test_value_semantics():
    a = ObjectLocation(bucket="b", path="p")
    b = ObjectLocation(bucket="b", path="p")
    c = ObjectLocation(bucket="b", path="q")
    assert a == b and hash(a) == hash(b)
    assert a != c
    assert a != "s3://b/p"
