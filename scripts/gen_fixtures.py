"""Write the committed deterministic fixtures under data/.

Run once (results are committed to git so the driver's DuckDB oracle
can read them at verify time): ``python scripts/gen_fixtures.py``.

Writer defaults mirror the reference's stac-geoparquet writer: ZSTD,
150k-row row groups (crates/core/src/geoparquet.rs:24-29).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rustac_spark import DATA_DIR
from rustac_spark.geocode import geocode_pandas
from rustac_spark.synth import (
    pages_pandas, queries_pandas, stac_items_pandas,
    stac_items_interval_pandas,
)

ROW_GROUP = 150_000  # reference default, crates/core/src/geoparquet.rs:29

PAGES_ARROW = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

BBOX_STRUCT = pa.struct([
    ("xmin", pa.float64()), ("ymin", pa.float64()),
    ("xmax", pa.float64()), ("ymax", pa.float64()),
])

STAC_ARROW = pa.schema([
    ("type", pa.string()),
    ("stac_version", pa.string()),
    ("stac_extensions", pa.list_(pa.string())),
    ("id", pa.string()),
    ("collection", pa.string()),
    ("geometry", pa.binary()),
    ("bbox", BBOX_STRUCT),
    ("datetime", pa.timestamp("us")),
    ("start_datetime", pa.timestamp("us")),
    ("end_datetime", pa.timestamp("us")),
    ("created", pa.timestamp("us")),
    ("updated", pa.timestamp("us")),
    ("sat:relative_orbit", pa.int64()),
    ("eo:cloud_cover", pa.float64()),
    ("links", pa.list_(pa.struct([
        ("href", pa.string()), ("rel", pa.string()), ("type", pa.string())]))),
])


def write(table: pa.Table, name: str) -> None:
    path = f"{DATA_DIR}/{name}.parquet"
    pq.write_table(table, path, compression="zstd", row_group_size=ROW_GROUP)
    print(f"wrote {path}: {table.num_rows} rows, "
          f"{os.path.getsize(path) / 1e6:.2f} MB")


def main() -> None:
    os.makedirs(DATA_DIR, exist_ok=True)
    for sf, n in [("sf0.001", 10_000), ("sf0.01", 100_000)]:
        pages = pages_pandas(n)
        write(pa.Table.from_pandas(pages, schema=PAGES_ARROW,
                                   preserve_index=False), f"pages_{sf}")
        geo = geocode_pandas(pages["url"])
        geo.insert(0, "url", pages["url"])
        write(pa.Table.from_pandas(geo, preserve_index=False),
              f"pages_geo_{sf}")

    queries_schema = pa.schema([
        ("query_id", pa.int64()), ("kind", pa.string()),
        ("qxmin", pa.float64()), ("qymin", pa.float64()),
        ("qxmax", pa.float64()), ("qymax", pa.float64()),
        ("geometry", pa.binary()), ("datetime", pa.string()),
        ("t_start", pa.timestamp("us")), ("t_end", pa.timestamp("us")),
    ])
    write(pa.Table.from_pandas(queries_pandas(), schema=queries_schema,
                               preserve_index=False), "queries")

    for name, pdf in [("stac_items", stac_items_pandas()),
                      ("stac_items_interval", stac_items_interval_pandas())]:
        write(pa.Table.from_pandas(pdf, schema=STAC_ARROW,
                                   preserve_index=False), name)


if __name__ == "__main__":
    main()
