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
