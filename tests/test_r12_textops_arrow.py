"""r12: shingle_sig_bands_udf moved from pandas_udf (evalType 200) to
arrow_udf (250). Parity gate: collected rows — including None texts, short
texts, and empty strings — must match a pandas_udf twin of the identical
kernel, and the plan must fuse with other 250 UDFs into one node."""

import contextlib
import io

import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_st_spark.operators.textops import shingle_sig_bands_udf, token_count


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, None),
        (2, ""),
        (3, "one two"),
        (4, "a a a a a a"),
        (5, "  leading and   trailing  spaces  "),
        (6, "the quick brown fox jumps over the lazy dog"),
    ]
    return spark.createDataFrame(rows, ["id", "text"]).cache()


def _pandas_twin(text, k=16, bands=4, shingle_n=3):
    """The pre-r12 boundary: identical kernel behind @pandas_udf."""
    import hashlib
    import re

    import numpy as np

    rows = k // bands
    ws = re.compile(r"\s+")

    @F.pandas_udf("struct<sh: array<string>, bands: array<string>>")
    def udf(s: pd.Series) -> pd.DataFrame:
        texts = s.tolist()
        sh_out, band_out = [], []
        for t in texts:
            if t is None:
                sh_out.append(None)
                band_out.append(None)
                continue
            toks = ws.split(t.strip().lower())
            if len(toks) >= shingle_n:
                sh = [" ".join(toks[i:i + shingle_n])
                      for i in range(len(toks) - shingle_n + 1)]
            else:
                sh = [" ".join(toks)]
            sh = list(dict.fromkeys(sh))
            sig = []
            for i in range(k):
                m = min(
                    int.from_bytes(
                        hashlib.md5(f"{i}:{x}".encode()).digest()[:4], "big")
                    for x in sh)
                sig.append(m)
            band_out.append([
                hashlib.md5(",".join(
                    str(v) for v in sig[b * rows:(b + 1) * rows]).encode()
                ).hexdigest()
                for b in range(bands)])
            sh_out.append(sh)
        return pd.DataFrame({"sh": sh_out, "bands": band_out})

    return udf(text)


def test_bands_struct_parity_with_pandas_boundary(docs):
    new = docs.select("id", shingle_sig_bands_udf("text").alias("s")).collect()
    old = docs.select("id", _pandas_twin(F.col("text")).alias("s")).collect()
    a = {r.id: (None if r.s is None else (r.s.sh, r.s.bands)) for r in new}
    b = {r.id: (None if r.s is None else (r.s.sh, r.s.bands)) for r in old}
    assert a == b


def test_bands_fuses_with_250_projection(docs):
    # mixed projection with a factory 250 UDF (st_point) must plan ONE
    # fused ArrowEvalPython node — the r11 rule this UDF used to violate
    import polars_st_spark as st

    d = docs.select(
        shingle_sig_bands_udf("text").alias("s"),
        st.st_point(F.col("id").cast("double"), F.lit(0.0)).alias("p"),
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        d.explain("formatted")
    plan = buf.getvalue()
    # formatted explain mentions each node twice (tree + details)
    assert plan.count("ArrowEvalPython") == 2, plan
    assert "BatchEvalPython" not in plan
    assert d.count() == 7
