"""Python-dependency drift pins — twenty-seventh hostile axis (round 17,
VERDICT r16 item 6).

Axis 21 (tools/drift_pin_check.py) pins the SPARK/DUCKDB behavior facts
the oracle conventions lean on; this axis pins the NUMPY/PANDAS/PYARROW
facts the Python-side operators lean on — the seam a dependency upgrade
moves first, and the one no API contract guarantees. Every probe
asserts CURRENT behavior exactly and names the convention site, so an
upgrade fails loudly with the reliance named instead of surfacing as
scattered wrong answers in the pandas-UDF operators.

What is pinned, and who leans on it:

Arrow batch layout under mapInPandas (the transfer seam itself):
- array<double> cells arrive as np.ndarray of float64, and
  np.array(list(series), dtype=np.float64) stacks a batch to (n, d) —
  similarity.py::_plane_signatures:229, :405, :481; clustering.py:141.
- binary cells arrive as Python bytes — multimodal.py:105,195,265 and
  codecs.py call bytes(payload) defensively, but the CURRENT type is
  pinned so a move to bytearray/memoryview names itself.
- long columns without nulls satisfy .to_numpy(np.int64) exactly —
  similarity.py:231,480.
- long columns WITH nulls arrive as float64-with-NaN (the classic
  Arrow->pandas widening): nothing leans on it today, pinned so a
  future nullable-Int64 default (pandas extension dtypes) names
  itself before an operator silently changes dtype.
- double columns with nulls honor .to_numpy(dtype, na_value=np.nan) —
  enrichment.py:321 (spatial ray-cast feeds NaN rows to the
  none-result path).
- timestamp columns arrive as datetime64[ns] series (measured on
  PySpark 4.1.2 + pandas 2.2.2: Spark's converter still requests ns
  despite pandas 2 supporting [us]) — streaming/ratelimit.py sorts
  and int()s them; a move to [us] changes int(ts) magnitude by 1000x
  anywhere code reads raw .value instead of the Timestamp API.
- spark.sql.execution.arrow.maxRecordsPerBatch bounds the per-batch
  row count — the codec/multimodal operators' memory story assumes
  bounded batches.
- return path: np.int32 columns land as Spark int, object columns
  with None land as NULL, and float np.nan in a returned double
  column becomes NULL (measured: pandas->Arrow treats NaN as the
  missing sentinel on this path — the OPPOSITE of the scan
  direction, where NaN stays a value). enrichment.py:323-332 returns
  object None-series for misses and relies on None->NULL; no engine
  operator returns NaN doubles from a pandas UDF, and this pin keeps
  that discipline honest — an operator that started doing so would
  emit NULLs, not NaNs, violating qcommon's nonfinite conventions.

Pure-library facts:
- np.frombuffer(..., dtype=">u2") decodes big-endian u16 —
  multimodal.py:143 (deterministic fake features).
- float32_array / python_float stays float32 (NEP-50 weak scalars) —
  multimodal.py:144 emits array<float>.
- np.linalg.norm: float64 in -> float64 out; float32 in -> FLOAT32
  out (numpy does NOT promote here — similarity.py always feeds
  float64 matrices precisely because of this; the pin keeps the
  "always float64 in" discipline honest).

Usage: python tools/pydep_drift_check.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FAILURES: list[str] = []


def probe(name: str, got, want) -> None:
    ok = got == want
    print(f"{'PASS' if ok else 'FAIL'} {name}: got={got!r}"
          + ("" if ok else f" want={want!r}"), flush=True)
    if not ok:
        FAILURES.append(name)


def pure_probes() -> None:
    import numpy as np
    import pandas as pd

    # N1 — big-endian u16 decode (multimodal fake features)
    u = np.frombuffer(b"\x01\x00\x80\x00", dtype=">u2")
    probe("numpy.frombuffer_be_u16", u.tolist(), [256, 32768])

    # N2 — float32 / python float stays float32 (NEP-50 weak scalar)
    v = (u.astype(np.float32) / 32768.0 - 1.0)
    probe("numpy.float32_div_pyfloat_stays_float32", str(v.dtype),
          "float32")

    # N3 — np.linalg.norm dtype behavior: float64 -> float64,
    # float32 -> float32 (NO promotion; similarity.py feeds float64)
    m64 = np.array([[3.0, 4.0]], dtype=np.float64)
    m32 = m64.astype(np.float32)
    probe("numpy.linalg_norm_float64_dtype",
          str(np.linalg.norm(m64, axis=1).dtype), "float64")
    probe("numpy.linalg_norm_float32_dtype",
          str(np.linalg.norm(m32, axis=1).dtype), "float32")
    probe("numpy.linalg_norm_value",
          float(np.linalg.norm(m64, axis=1)[0]), 5.0)

    # P1 — to_numpy na_value honored on a nullable float series
    s = pd.Series([1.5, None], dtype="float64")
    out = s.to_numpy(dtype=np.float64, na_value=np.nan)
    probe("pandas.to_numpy_na_value_nan",
          (out[0] == 1.5, bool(np.isnan(out[1]))), (True, True))


def spark_probes() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from earthquake_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="edps-pydep-pins", cpus=4,
                      shuffle_partitions=4)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")

    df = spark.sql("""
        SELECT id,
               array(cast(id as double), cast(id+1 as double)) AS vec,
               cast(concat('b', id) as binary) AS payload,
               timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,0,0,id)
                 AS ts,
               CASE WHEN id % 2 = 0 THEN id END AS maybe_long,
               CASE WHEN id % 2 = 0 THEN cast(id as double) END AS maybe_dbl
        FROM range(1000)
    """).repartition(1)

    schema = ("cell_type string, cell_dtype string, stack_shape string, "
              "payload_type string, ts_dtype string, maybe_long_dtype "
              "string, na_ok boolean, batch_len long, id_sum long")

    def observe(it):
        for pdf in it:
            cell = pdf["vec"].iloc[0]
            mat = np.array(list(pdf["vec"]), dtype=np.float64)
            nn = pdf["maybe_dbl"].to_numpy(dtype=np.float64,
                                           na_value=np.nan)
            odd = np.isnan(nn[pdf["id"].to_numpy(np.int64) % 2 == 1])
            yield pd.DataFrame({
                "cell_type": [type(cell).__name__],
                "cell_dtype": [str(getattr(cell, "dtype", None))],
                "stack_shape": [f"{mat.shape[1]}x{str(mat.dtype)}"],
                "payload_type": [type(pdf["payload"].iloc[0]).__name__],
                "ts_dtype": [str(pdf["ts"].dtype)],
                "maybe_long_dtype": [str(pdf["maybe_long"].dtype)],
                "na_ok": [bool(odd.all())],
                "batch_len": [len(pdf)],
                "id_sum": [int(pdf["id"].sum())],
            })

    rows = df.mapInPandas(observe, schema).collect()
    agg = {
        "cell_type": {r["cell_type"] for r in rows},
        "cell_dtype": {r["cell_dtype"] for r in rows},
        "stack_shape": {r["stack_shape"] for r in rows},
        "payload_type": {r["payload_type"] for r in rows},
        "ts_dtype": {r["ts_dtype"] for r in rows},
        "maybe_long_dtype": {r["maybe_long_dtype"] for r in rows},
    }
    probe("arrow.array_double_cell_is_ndarray", agg["cell_type"],
          {"ndarray"})
    probe("arrow.array_double_cell_dtype", agg["cell_dtype"], {"float64"})
    probe("arrow.list_stack_to_matrix", agg["stack_shape"],
          {"2xfloat64"})
    probe("arrow.binary_cell_is_bytes", agg["payload_type"], {"bytes"})
    probe("arrow.timestamp_series_dtype", agg["ts_dtype"],
          {"datetime64[ns]"})
    probe("arrow.long_with_nulls_widens_to_float64",
          agg["maybe_long_dtype"], {"float64"})
    probe("arrow.to_numpy_na_value_under_mapinpandas",
          all(r["na_ok"] for r in rows), True)
    probe("arrow.max_records_per_batch_bounds",
          max(r["batch_len"] for r in rows) <= 100, True)
    probe("arrow.batches_cover_partition",
          sum(r["id_sum"] for r in rows), 499_500)

    # return path: int32 numpy -> Spark int; object None -> NULL;
    # np.nan in a double column -> NaN VALUE (not NULL); datetime64
    # round-trips to the same timestamp
    def emit(it):
        for _ in it:
            yield pd.DataFrame({
                "i32": np.array([7], dtype=np.int32),
                "s": pd.Series([None], dtype=object),
                "d": [float("nan")],
                "t": pd.Series([pd.Timestamp("2024-03-01 00:00:01")]),
            })

    out = spark.range(1).repartition(1).mapInPandas(
        emit, "i32 int, s string, d double, t timestamp"
    )
    r = out.select(
        "i32",
        F.col("s").isNull().alias("s_null"),
        F.isnan("d").alias("d_nan"),
        F.col("d").isNull().alias("d_null"),
        F.unix_micros("t").alias("t_us"),
    ).first()
    probe("arrow.return_int32_lands_as_int", r["i32"], 7)
    probe("arrow.return_object_none_is_null", r["s_null"], True)
    probe("arrow.return_nan_becomes_null",
          (r["d_nan"], r["d_null"]), (False, True))
    probe("arrow.return_timestamp_roundtrip", r["t_us"],
          1_709_251_201_000_000)


def main() -> int:
    import numpy
    import pandas
    import pyarrow

    print(f"numpy {numpy.__version__}  pandas {pandas.__version__}  "
          f"pyarrow {pyarrow.__version__}")
    pure_probes()
    spark_probes()
    n_fail = len(FAILURES)
    if n_fail:
        print(f"pydep-drift: {n_fail} pinned fact(s) DRIFTED: "
              f"{FAILURES} — re-adjudicate the conventions named in "
              "the module docstring")
        return 1
    print("pydep-drift: all pinned numpy/pandas/pyarrow facts hold")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
