import numpy as np
import pytest

from scalpel_spark.datagen.images import decode_png, encode_png, mean_hash_64, psnr
from scalpel_spark.datagen.world import (
    WorldParams,
    generate_world,
    image_pixels,
    is_lossy,
    make_image_row,
)


class TestPngCodec:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        px = rng.integers(0, 256, size=(13, 21, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px)

    def test_roundtrip_tiny(self):
        px = np.zeros((1, 1, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px)

    def test_psnr(self):
        a = np.zeros((8, 8, 3), dtype=np.uint8)
        assert psnr(a, a) == float("inf")
        b = a.copy()
        b[0, 0, 0] = 255
        assert 0 < psnr(a, b) < 40

    def test_mean_hash_stable(self):
        px = image_pixels(5)
        assert mean_hash_64(px) == mean_hash_64(px)
        assert -(1 << 63) <= mean_hash_64(px) < (1 << 63)


class TestWorld:
    @pytest.fixture(scope="class")
    def world(self):
        return generate_world(WorldParams(n_hosts=6, n_pages=60, n_images=30))

    def test_deterministic(self):
        p = WorldParams(n_hosts=4, n_pages=20, n_images=10)
        w1 = generate_world(p)
        w2 = generate_world(p)
        assert w1["pages"] == w2["pages"]
        assert [r["phash"] for r in w1["images"]] == [
            r["phash"] for r in w2["images"]
        ]

    def test_image_fidelity_gate(self):
        params = WorldParams(n_images=40)
        lossy_seen = lossless_seen = 0
        for i in range(40):
            row = make_image_row(i, params)
            decoded = decode_png(row["bytes"])
            truth = image_pixels(i, params.seed)
            assert decoded.shape == truth.shape == (row["h"], row["w"], 3)
            if is_lossy(i, params):
                lossy_seen += 1
                assert psnr(decoded, truth) >= 40.0
            else:
                lossless_seen += 1
                assert np.array_equal(decoded, truth)
        assert lossy_seen > 0 and lossless_seen > 0

    def test_pages_reference_valid_images_and_links(self, world):
        ids = {r["image_id"] for r in world["images"]}
        urls = {p["url"] for p in world["pages"]}
        for p in world["pages"]:
            for iid in p["image_ids"]:
                assert iid in ids
            for link in p["out_links"]:
                assert link in urls

    def test_extraction_matches_ground_truth(self, world):
        """The scraper applied to generated html must recover exactly the
        ground-truth image_ids + captions — the oracle the crawl uses."""
        from scalpel_spark import any_selector, attr, chroots, scrape_html, sdo
        from scalpel_spark.datagen.world import image_caption

        for p in world["pages"][:40]:
            got = scrape_html(
                p["html"],
                chroots(
                    "img", sdo(attr("src", any_selector), attr("alt", any_selector))
                ),
            )
            got_ids = [src.rsplit("/", 1)[1].removesuffix(".png") for src, _ in got]
            assert got_ids == p["image_ids"]
            for (_, alt), iid in zip(got, p["image_ids"]):
                assert alt == image_caption(int(iid.split("-")[1]))

    def test_link_extraction_canonicalizes_to_ground_truth(self, world):
        from scalpel_spark import attrs, scrape_html, tag
        from scalpel_spark.crawl.urlnorm import canonicalize_url

        for p in world["pages"][:60]:
            hrefs = scrape_html(p["html"], attrs("href", tag("a")))
            canon = [canonicalize_url(h, base=p["url"]) for h in hrefs]
            assert canon == p["out_links"]

    def test_zipf_skew_present(self, world):
        from collections import Counter

        counts = Counter(p["host"] for p in world["pages"])
        top = counts.most_common(1)[0][1]
        assert top >= 3 * (len(world["pages"]) / (5 * len(counts)))

    def test_write_world(self, tmp_path):
        import pyarrow.parquet as pq

        from scalpel_spark.datagen.world import write_world

        params = WorldParams(n_hosts=3, n_pages=12, n_images=6)
        write_world(str(tmp_path), params)
        t = pq.read_table(str(tmp_path / "images.parquet"))
        assert [f.name for f in t.schema] == [
            "image_id",
            "bytes",
            "w",
            "h",
            "fmt",
            "caption",
            "phash",
        ]
        assert t.num_rows == 6
        assert pq.read_table(str(tmp_path / "pages.parquet")).num_rows == 12


class TestJpegCodec:
    """Pure-numpy baseline JPEG: the non-PNG half of the image-format
    contract. Encoder and decoder meet only at the wire format (the
    decoder reads its tables from DQT/DHT), so a round-trip is a real
    two-implementation check."""

    def test_roundtrip_psnr(self):
        from scalpel_spark.datagen.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(0)
        cases = [
            rng.integers(0, 256, (64, 64, 3), dtype=np.uint8),  # worst case: noise
            rng.integers(0, 256, (33, 17, 3), dtype=np.uint8),  # non-multiple-of-8
            np.full((8, 8, 3), 200, np.uint8),
            rng.integers(0, 256, (3, 5, 3), dtype=np.uint8),  # sub-block
        ]
        for px in cases:
            dec = decode_jpeg(encode_jpeg(px, quality=100))
            assert dec.shape == px.shape and dec.dtype == np.uint8
            assert psnr(dec, px) >= 40.0

    def test_quality_monotone(self):
        from scalpel_spark.datagen.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        sizes, errs = [], []
        for q in (100, 90, 60):
            blob = encode_jpeg(px, quality=q)
            sizes.append(len(blob))
            errs.append(psnr(decode_jpeg(blob), px))
        assert sizes[0] > sizes[1] > sizes[2]  # lower q -> smaller file
        assert errs[0] > errs[1] > errs[2]  # lower q -> lower psnr

    def test_rejects_non_jpeg(self):
        from scalpel_spark.datagen.jpeg import decode_jpeg

        with pytest.raises(ValueError):
            decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")

    def test_zigzag_matches_spec_table(self):
        """The scan order must equal ITU-T T.81 Annex A Figure A.6 — a
        hardcoded copy of the spec table, so a shared-constant bug between
        encoder and decoder (both import _ZIGZAG) can't self-validate.
        A transposed variant round-trips fine but is not wire-format JPEG."""
        from scalpel_spark.datagen.jpeg import _ZIGZAG

        spec = [
            0,  1,  8, 16,  9,  2,  3, 10,
            17, 24, 32, 25, 18, 11,  4,  5,
            12, 19, 26, 33, 40, 48, 41, 34,
            27, 20, 13,  6,  7, 14, 21, 28,
            35, 42, 49, 56, 57, 50, 43, 36,
            29, 22, 15, 23, 30, 37, 44, 51,
            58, 59, 52, 45, 38, 31, 39, 46,
            53, 60, 61, 54, 47, 55, 62, 63,
        ]
        assert _ZIGZAG.tolist() == spec


class TestMixedFormatWorld:
    def test_jpeg_rows_decode_and_keep_invariants(self):
        """jpeg_fraction > 0: both formats present; every row decodes
        via the dispatching decode_image; PSNR >= 40 dB vs ground-truth
        pixels; the stored phash equals the recompute-from-bytes hash
        (datagen computes jpeg phash from DECODED pixels); and the
        <img src> extension round-trips through the shared
        image_id_from_src used by engine + simulator."""
        from scalpel_spark.crawl.logic import extract_page, image_id_from_src
        from scalpel_spark.datagen.world import (
            WorldParams,
            generate_world,
            image_pixels,
            is_jpeg,
        )
        from scalpel_spark.imageops import decode_image

        params = WorldParams(seed=11, n_hosts=4, n_pages=40, n_images=30,
                             jpeg_fraction=0.5)
        world = generate_world(params)
        fmts = {r["fmt"] for r in world["images"]}
        assert fmts == {"png", "jpeg"}
        for r in world["images"]:
            i = int(r["image_id"].split("-")[1])
            px = decode_image(bytes(r["bytes"]), r["fmt"])
            assert (r["fmt"] == "jpeg") == is_jpeg(i, params)
            assert psnr(px, image_pixels(i, params.seed)) >= 40.0
            assert mean_hash_64(px) == r["phash"]
        # .jpg srcs flow through the shared extraction contract
        jpg_srcs = [
            (iid, src)
            for p in world["pages"]
            for iid, src, _cap in extract_page(p["html"], p["url"]).images
            if src.endswith(".jpg")
        ]
        assert jpg_srcs and all(
            image_id_from_src(src) == iid for iid, src in jpg_srcs
        )
