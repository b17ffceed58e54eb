"""The image path is a REAL byte-level codec: payloads are genuine PGM (P5)
containers and ``_parse_pgm`` must behave like an actual decoder -- accept
well-formed images, reject corrupt ones -- not echo metadata columns."""

from __future__ import annotations

import numpy as np
import pytest

from delta_lake_stock_pipeline_spark.operators.multimodal import (
    _parse_pgm,
    _pgm_table,
)

from conftest import SF_DIR


def test_parse_pgm_roundtrip():
    w, h, pix = _parse_pgm(b"P5\n3 2\n255\nabcdef")
    assert (w, h) == (3, 2)
    assert pix.tolist() == [97, 98, 99, 100, 101, 102]
    assert pix.dtype == np.uint8


@pytest.mark.parametrize(
    "buf",
    [
        b"P6\n2 2\n255\n1234",  # wrong magic (color PPM)
        b"P5\n3 2\n255\n12345",  # payload shorter than header geometry
        b"P5\n2 2\n255\n12345",  # payload longer than header geometry
        b"P5\n2 2\n65535\n1234",  # 16-bit maxval unsupported
    ],
)
def test_parse_pgm_rejects_corrupt_payloads(buf):
    with pytest.raises(ValueError):
        _parse_pgm(buf)


def test_synthesized_payloads_are_decodable_images(spark):
    """Every JVM-synthesized payload must be a valid P5 container whose
    decoded geometry matches the metadata columns -- i.e. the synthesis and
    the decoder agree on the format, end-to-end through Arrow."""
    rows = _pgm_table(spark, SF_DIR).limit(20).collect()
    assert rows
    for r in rows:
        w, h, pix = _parse_pgm(bytes(r["payload"]))
        assert (w, h) == (r["width"], r["height"])
        assert pix.size == r["n_pixels"]


def _band_vals(hi: int, lo: int) -> list[tuple[int, int]]:
    """Python mirror of the engine/oracle 8x8-bit band decomposition."""
    return [(i, (lo >> (8 * i)) & 255) for i in range(4)] + [
        (i + 4, (hi >> (8 * i)) & 255) for i in range(4)
    ]


@pytest.mark.parametrize("seed", range(50))
def test_ahash_banding_recall_under_threshold(seed):
    """Pigeonhole recall of the m_image_neardup banding: any pair of
    64-bit hashes at hamming <= 7 leaves at least one of the eight 8-bit
    bands EQUAL, and whenever an equal band is nonzero the candidate
    equi-join surfaces the pair. Randomized over seeds instead of
    hypothesis because the property is pure integer math (no Spark)."""
    import random

    rng = random.Random(seed)
    bits = [rng.getrandbits(1) for _ in range(64)]
    flips = rng.sample(range(64), rng.randint(0, 7))
    other = list(bits)
    for f in flips:
        other[f] ^= 1

    def pack(bs):
        lo = sum(1 << b for b in range(32) if bs[b])
        hi = sum(1 << (b - 32) for b in range(32, 64) if bs[b])
        return hi, lo

    a, b = pack(bits), pack(other)
    equal = [
        (band, va)
        for (band, va), (_, vb) in zip(_band_vals(*a), _band_vals(*b))
        if va == vb
    ]
    assert equal, "hamming <= 7 must leave one of 8 bands untouched"
    # candidate-generation mirror: nonzero equal band <=> inverted-index hit
    cand_a = {(band, v) for band, v in _band_vals(*a) if v != 0}
    cand_b = {(band, v) for band, v in _band_vals(*b) if v != 0}
    assert bool(cand_a & cand_b) == any(v != 0 for _, v in equal)


def test_image_neardup_matches_brute_force(spark):
    """End-to-end recall AND precision on the real fixture: the banded
    pipeline's output must equal the all-pairs brute force over the same
    augmented corpus -- every pair sharing a nonzero band at hamming <= 7
    with both hashes >= 8 bright blocks, no more, no fewer."""
    from delta_lake_stock_pipeline_spark.operators.multimodal import (
        _ND_HAMMING_MAX,
        _ND_MIN_BRIGHT,
        _ahash_of,
        _neardup_corpus,
        _pgm_of,
        image_neardup,
    )

    hashes = {
        r["doc_id"]: (r["n_bright_blocks"], r["ahash_hi"], r["ahash_lo"])
        for r in _ahash_of(_pgm_of(_neardup_corpus(spark, SF_DIR))).collect()
    }
    want = set()
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        nb_a, hi_a, lo_a = hashes[a]
        bands_a = {(band, v) for band, v in _band_vals(hi_a, lo_a) if v != 0}
        for b in ids[i + 1 :]:
            nb_b, hi_b, lo_b = hashes[b]
            if min(nb_a, nb_b) < _ND_MIN_BRIGHT:
                continue
            bands_b = {
                (band, v) for band, v in _band_vals(hi_b, lo_b) if v != 0
            }
            shared = bands_a & bands_b
            if not shared:
                continue
            hd = bin((hi_a ^ hi_b)).count("1") + bin((lo_a ^ lo_b)).count("1")
            if hd <= _ND_HAMMING_MAX:
                want.add((a, b, len(shared), hd))
    got = {
        (r["doc_a"], r["doc_b"], r["n_shared_bands"], r["hamming"])
        for r in image_neardup(spark, SF_DIR).collect()
    }
    assert got == want
    assert want, "fixture must witness at least one near-dup pair"


def test_audio_neardup_matches_brute_force(spark):
    """Audio leg of the banded near-dup pipeline: output must equal the
    all-pairs brute force over the same augmented corpus -- every pair
    sharing a nonzero 8-bit fingerprint band at hamming <= 7 with both
    fingerprints >= 8 rising steps. Twin pairs must be witnessed."""
    import pyspark.sql.functions as F

    from delta_lake_stock_pipeline_spark.operators.multimodal import (
        _ND_HAMMING_MAX,
        _ND_MIN_BRIGHT,
        _ND_TWIN_BASE,
        _afp_of,
        _neardup_corpus,
        audio_neardup,
    )

    media = _neardup_corpus(spark, SF_DIR).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    fps = {
        r["doc_id"]: (r["fp"], r["n_rising"])
        for r in _afp_of(media).collect()
    }
    want = set()
    ids = sorted(fps)
    for i, a in enumerate(ids):
        fp_a, nr_a = fps[a]
        bands_a = {
            (band, (fp_a >> (8 * band)) & 255)
            for band in range(8)
            if (fp_a >> (8 * band)) & 255
        }
        for b in ids[i + 1 :]:
            fp_b, nr_b = fps[b]
            if min(nr_a, nr_b) < _ND_MIN_BRIGHT:
                continue
            bands_b = {
                (band, (fp_b >> (8 * band)) & 255)
                for band in range(8)
                if (fp_b >> (8 * band)) & 255
            }
            shared = bands_a & bands_b
            if not shared:
                continue
            hd = bin(fp_a ^ fp_b).count("1")
            if hd <= _ND_HAMMING_MAX:
                want.add((a, b, len(shared), hd))
    got = {
        (r["doc_a"], r["doc_b"], r["n_shared_bands"], r["hamming"])
        for r in audio_neardup(spark, SF_DIR).collect()
    }
    assert got == want
    assert any(
        b - a == _ND_TWIN_BASE for a, b, _, _ in want
    ), "fixture must witness at least one twin pair"


def test_image_incremental_matches_pair_derivation(spark):
    """The asymmetric admission must be exactly derivable from the
    symmetric pair relation: for every batch image, the best corpus
    match among (corpus -> batch) pairs under (hamming ASC, corpus id
    ASC), novel when none -- proving the asymmetric banded join drops no
    candidate the self-join form finds (and admits none it doesn't)."""
    from delta_lake_stock_pipeline_spark.operators.multimodal import (
        _ND_TWIN_BASE,
        image_incremental,
        image_neardup,
    )

    pairs = [
        (r["doc_a"], r["doc_b"], r["n_shared_bands"], r["hamming"])
        for r in image_neardup(spark, SF_DIR).collect()
        if r["doc_b"] >= _ND_TWIN_BASE and r["doc_a"] < _ND_TWIN_BASE
    ]
    best = {}
    for a, b, nsb, hd in pairs:
        cur = best.get(b)
        if cur is None or (hd, a) < (cur[3], cur[0]):
            best[b] = (a, b, nsb, hd)
    got = {
        r["new_doc"]: (
            r["matched_doc"],
            r["n_shared_bands"],
            r["hamming"],
            r["is_novel"],
        )
        for r in image_incremental(spark, SF_DIR).collect()
    }
    batch_ids = {b for b in got}
    assert batch_ids, "fixture must have a batch"
    for b in batch_ids:
        if b in best:
            a, _, nsb, hd = best[b]
            assert got[b] == (a, nsb, hd, 0)
        else:
            assert got[b] == (None, None, None, 1)
    # every matched pair's batch doc is present
    assert set(best) <= batch_ids


def test_audio_incremental_matches_pair_derivation(spark):
    """Audio twin of the image derivation test."""
    from delta_lake_stock_pipeline_spark.operators.multimodal import (
        _ND_TWIN_BASE,
        audio_incremental,
        audio_neardup,
    )

    pairs = [
        (r["doc_a"], r["doc_b"], r["n_shared_bands"], r["hamming"])
        for r in audio_neardup(spark, SF_DIR).collect()
        if r["doc_b"] >= _ND_TWIN_BASE and r["doc_a"] < _ND_TWIN_BASE
    ]
    best = {}
    for a, b, nsb, hd in pairs:
        cur = best.get(b)
        if cur is None or (hd, a) < (cur[3], cur[0]):
            best[b] = (a, b, nsb, hd)
    got = {
        r["new_doc"]: (
            r["matched_doc"],
            r["n_shared_bands"],
            r["hamming"],
            r["is_novel"],
        )
        for r in audio_incremental(spark, SF_DIR).collect()
    }
    for b in got:
        if b in best:
            a, _, nsb, hd = best[b]
            assert got[b] == (a, nsb, hd, 0)
        else:
            assert got[b] == (None, None, None, 1)


def test_av_consensus_matches_pair_sets(spark):
    """The consensus matrix must be exactly the union of the two pair
    relations with correct membership flags."""
    from delta_lake_stock_pipeline_spark.operators.multimodal import (
        audio_neardup,
        av_consensus,
        image_neardup,
    )

    img = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in image_neardup(spark, SF_DIR).collect()
    }
    aud = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in audio_neardup(spark, SF_DIR).collect()
    }
    rows = av_consensus(spark, SF_DIR).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == set(img) | set(aud)
    for r in rows:
        k = (r["doc_a"], r["doc_b"])
        assert r["hamming_image"] == img.get(k)
        assert r["hamming_audio"] == aud.get(k)
        assert r["in_image"] == int(k in img)
        assert r["in_audio"] == int(k in aud)
        assert r["consensus"] == int(k in img and k in aud)


def test_video_neardup_matches_brute_force(spark):
    """End-to-end recall AND precision for the video leg: the posting
    join's output must equal the all-pairs brute force over the same
    twin-augmented corpus -- every pair of full-length clips sharing >=
    _VD_MIN_SHARED exact (frame_idx, f_len, f_energy) signatures, no
    more, no fewer -- and every twin pair must be found at exactly 15
    shared frames (one corrupted middle character == one corrupted
    frame; 16 iff that character already was 'Q')."""
    from delta_lake_stock_pipeline_spark.operators.multimodal import (
        _VD_MIN_SHARED,
        _VD_TWIN_BASE,
        _VD_TWIN_MOD,
        _VD_TWIN_RES,
        _video_corpus,
        _video_frames_of,
        video_neardup,
    )

    frames: dict[int, set] = {}
    for r in _video_frames_of(_video_corpus(spark, SF_DIR)).collect():
        frames.setdefault(r["doc_id"], set()).add(
            (r["frame_idx"], r["f_len"], r["f_energy"], r["f_wsum"])
        )
    ids = sorted(frames)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = len(frames[a] & frames[b])
            if shared >= _VD_MIN_SHARED:
                want.add((a, b, shared))
    got = {
        (r["doc_a"], r["doc_b"], r["n_shared_frames"])
        for r in video_neardup(spark, SF_DIR).collect()
    }
    assert got == want
    twin_pairs = {
        (d, d + _VD_TWIN_BASE)
        for d in ids
        if d % _VD_TWIN_MOD == _VD_TWIN_RES
        and d < _VD_TWIN_BASE
        and (d + _VD_TWIN_BASE) in frames
    }
    assert twin_pairs, "fixture must yield full-length twins"
    found = {(a, b): s for a, b, s in want}
    for pair in twin_pairs:
        assert found.get(pair, 0) >= 15, f"twin {pair} not recalled"


def test_video_incremental_matches_pair_derivation(spark):
    """The asymmetric video admission must be exactly derivable from the
    symmetric pair relation: for every batch clip, the best corpus match
    among (corpus -> batch) pairs under (n_shared_frames DESC, corpus id
    ASC), novel when none -- proving the asymmetric posting join drops
    no candidate the self-join form finds (and admits none it doesn't)."""
    from delta_lake_stock_pipeline_spark.operators.multimodal import (
        _VD_TWIN_BASE,
        video_incremental,
        video_neardup,
    )

    pairs = [
        (r["doc_a"], r["doc_b"], r["n_shared_frames"])
        for r in video_neardup(spark, SF_DIR).collect()
        if r["doc_b"] >= _VD_TWIN_BASE and r["doc_a"] < _VD_TWIN_BASE
    ]
    best = {}
    for a, b, ns in pairs:
        cur = best.get(b)
        if cur is None or (-ns, a) < (-cur[2], cur[0]):
            best[b] = (a, b, ns)
    got = {
        r["new_doc"]: (r["matched_doc"], r["n_shared_frames"], r["is_novel"])
        for r in video_incremental(spark, SF_DIR).collect()
    }
    batch_ids = set(got)
    assert batch_ids, "fixture must have a batch"
    for b in batch_ids:
        if b in best:
            a, _, ns = best[b]
            assert got[b] == (a, ns, 0)
        else:
            assert got[b] == (None, None, 1)
    assert set(best) <= batch_ids
