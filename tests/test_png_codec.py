"""Pure-stdlib PNG codec (functions/png.py) + the real resize path.

Round-trips pin the decoder against our encoder across every scanline
filter type and color layout; the Spark test drives resize_image
end-to-end with real PNG bytes AND malformed inputs (which must yield
error rows, never task failures).
"""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_automated_evaluator_spark.functions.png import (
    PngFormatError,
    decode_png,
    encode_png,
    resize_nearest,
    resize_png,
)


def _img(h, w, ch, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_round_trip_all_filters_and_layouts(ch, filter_type):
    img = _img(13, 7, ch, seed=ch * 10 + filter_type)
    back = decode_png(encode_png(img, filter_type=filter_type))
    assert back.shape == img.shape
    assert (back == img).all()


def test_resize_nearest_shape_and_identity():
    img = _img(20, 10, 3)
    out = resize_nearest(img, 5, 4)
    assert out.shape == (4, 5, 3)
    same = resize_nearest(img, 10, 20)
    assert (same == img).all()  # same size -> exact identity
    up = decode_png(resize_png(encode_png(img), 40, 60))
    assert up.shape == (60, 40, 3)


def test_decode_rejects_garbage():
    with pytest.raises(PngFormatError):
        decode_png(b"not a png at all")
    with pytest.raises(PngFormatError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)  # header only


def test_spark_resize_image_real_and_dirty(spark):
    from data_quality_automated_evaluator_spark.operators.multimodal import (
        resize_image,
    )

    good = encode_png(_img(24, 16, 3, seed=5))
    rows = [
        (1, bytearray(good)),
        (2, bytearray(b"\xff\xd8garbage-jpeg")),  # unsupported format
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r for r in resize_image(df, 8, 6).collect()}
    assert out[1]["error"] is None
    resized = decode_png(bytes(out[1]["content"]))
    assert resized.shape == (6, 8, 3)
    assert out[2]["content"] is None and out[2]["error"] is not None
    assert out[3]["content"] is None and out[3]["error"] == "null content"


def test_extract_features_real_for_png(spark):
    import numpy as np

    from data_quality_automated_evaluator_spark.operators.multimodal import (
        extract_features,
    )

    img = _img(10, 10, 3, seed=9)
    rows = [(1, bytearray(encode_png(img))), (2, bytearray(b"not-an-image"))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r["features"] for r in extract_features(df).collect()}
    f = np.array(out[1])
    # real pixel features: first 3 = channel means, bins 8..16 a histogram
    exp_means = img.reshape(-1, 3).mean(axis=0) / 255.0
    assert np.allclose(f[:3], exp_means, atol=1e-9)
    assert abs(f[8:16].sum() - 1.0) < 1e-9
    # non-PNG falls back to the digest fake (still deterministic, 16-dim)
    assert len(out[2]) == 16 and not np.allclose(out[2][8:16], f[8:16])


def test_render_png_chart_without_matplotlib(tmp_path):
    import pandas as pd

    from data_quality_automated_evaluator_spark.charts import make_charts
    from data_quality_automated_evaluator_spark.functions.aggregates import (
        TIME_INTERVAL_COL,
    )
    from data_quality_automated_evaluator_spark.operators.evaluate import (
        ColumnEvaluation,
    )

    data = pd.DataFrame(
        {
            TIME_INTERVAL_COL: [f"2024-01-{d:02d}" for d in range(1, 11)],
            "m": [1.0, 2.0, 1.5, 8.0, 1.2, 1.1, 1.4, 1.3, 1.2, 1.6],
        }
    )
    ev = ColumnEvaluation.__new__(ColumnEvaluation)
    ev.column = "m"
    ev.title = "metric m"
    ev.chart_bounds = (0.5, 3.0)
    path = make_charts(data, [ev], str(tmp_path), "grp", fmt="png")
    assert path.endswith("grp.png")
    img = decode_png(open(path, "rb").read())
    assert img.shape[0] > 100 and img.shape[1] > 500 and img.shape[2] == 3
    # the canvas is not blank: series/band/frame pixels darker than white
    assert (img < 250).any()
    # and the outlier band really shades a horizontal region
    grey_rows = ((img < 250).any(axis=(1, 2))).sum()
    assert grey_rows > 20
