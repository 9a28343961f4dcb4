import json
import os

import pandas as pd

from scalpel_spark.crawl.fetch import (
    decode_body_series,
    default_decoder,
    iso88591_decoder,
    utf8_decoder,
)
from scalpel_spark.crawl.tableio import SnapshotStore


class TestDecoder:
    """Charset rules pinned to the reference defaultDecoder
    (scalpel/src/Text/HTML/Scalpel/Internal/Scrape/URL.hs:87-103)."""

    def test_utf8_when_header_says_so(self):
        body = "héllo".encode("utf-8")
        assert default_decoder(body, "text/html; charset=utf-8") == "héllo"
        assert default_decoder(body, "TEXT/HTML; CHARSET=UTF-8") == "héllo"

    def test_latin1_otherwise(self):
        body = "héllo".encode("latin-1")
        assert default_decoder(body, "text/html; charset=iso-8859-1") == "héllo"
        assert default_decoder(body, "text/html") == "héllo"
        assert default_decoder(body, None) == "héllo"

    def test_utf8_bytes_under_latin1_dont_fail(self):
        body = "héllo".encode("utf-8")
        out = default_decoder(body, "text/html")
        assert "h" in out and out != "héllo"  # mojibake, but total

    def test_forced_decoders(self):
        assert utf8_decoder("é".encode("utf-8")) == "é"
        assert iso88591_decoder("é".encode("latin-1")) == "é"

    def test_series_path(self):
        bodies = pd.Series(["é".encode("utf-8"), "é".encode("latin-1"), None])
        cts = pd.Series(["text/html; charset=utf-8", "text/html", None])
        out = decode_body_series(bodies, cts)
        assert out[0] == "é" and out[1] == "é" and out[2] is None


class TestSnapshotStore:
    def test_commit_and_resume_info(self, tmp_path):
        store = SnapshotStore(str(tmp_path))
        store.init_engine({"x": 1})
        assert store.last_complete_round() is None
        store.commit_round(
            0,
            {"fetched": (store.table_path(0, "fetched"), 10)},
            {"n_fetched": 10, "total_fetched": 10},
        )
        store.commit_round(
            1,
            {"fetched": (store.table_path(1, "fetched"), 5)},
            {"n_fetched": 5, "total_fetched": 15},
        )
        assert store.last_complete_round() == 1
        m = store.read_manifest()
        assert m["engine"] == {"x": 1}
        assert [r["round"] for r in m["rounds"]] == [0, 1]
        assert m["rounds"][1]["metrics"]["total_fetched"] == 15

    def test_recommit_round_replaces(self, tmp_path):
        store = SnapshotStore(str(tmp_path))
        store.commit_round(0, {}, {"n_fetched": 1, "total_fetched": 1})
        store.commit_round(0, {}, {"n_fetched": 2, "total_fetched": 2})
        m = store.read_manifest()
        assert len(m["rounds"]) == 1
        assert m["rounds"][0]["metrics"]["n_fetched"] == 2

    def test_manifest_is_atomic_json(self, tmp_path):
        store = SnapshotStore(str(tmp_path))
        store.commit_round(0, {}, {"n_fetched": 0, "total_fetched": 0})
        with open(store.manifest_path) as f:
            json.load(f)  # parses
        assert not os.path.exists(store.manifest_path + ".tmp")
