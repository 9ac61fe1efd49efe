"""CLI — the `rustac` command-line surface re-expressed over Spark
(reference entry point A: crates/cli/src/lib.rs:39-137, search
subcommand 171-250; dispatch 430-439; translate 811-819).

    python -m rustac_spark search ITEMS.parquet --bbox -106.1,40.5,-106.0,40.6 \
        --datetime 2024 --sortby -datetime --limit 10 -o out.json
    python -m rustac_spark translate IN.(parquet|ndjson) OUT.(parquet|ndjson|json) [--migrate]
    python -m rustac_spark validate ITEMS.parquet
    python -m rustac_spark collections ITEMS.parquet

Search string parsing mirrors the reference's GetSearch conversions
(search.rs:469-493): bbox "a,b,c,d", sortby "-f", fields "+a,-b",
filter as cql2-text.
"""

from __future__ import annotations

import argparse
import json
import sys

from .stac.io import infer_from_href


def _spark(args):
    from .session import get_spark
    return get_spark("rustac-cli", master=args.master)


def _read_items(spark, path: str):
    from .stac.translate import coerce_item_columns
    fmt = infer_from_href(path)
    if fmt.kind == "geoparquet":
        # dirty-parquet fixups (non-string id, stringified
        # stac_extensions) are no-ops on clean tables
        return coerce_item_columns(spark.read.parquet(path))
    return spark.read.json(path)  # ndjson / json-lines


def _write(df, out: str | None, matched: int | None = None) -> None:
    from .stac.items_io import iter_items, write_feature_collection
    from .stac.translate import write_stac_geoparquet
    if out is None:
        for item in iter_items(df):
            json.dump(item, sys.stdout, separators=(",", ":"), default=str)
            sys.stdout.write("\n")
        return
    fmt = infer_from_href(out)
    if fmt.kind == "geoparquet":
        write_stac_geoparquet(df, out)
    elif fmt.kind == "ndjson":
        with open(out, "w") as f:
            for item in iter_items(df):
                json.dump(item, f, separators=(",", ":"), default=str)
                f.write("\n")
    else:
        write_feature_collection(df, out, matched=matched)


def cmd_search(args) -> int:
    from .stac.search import Search, build_plan
    spark = _spark(args)
    df = _read_items(spark, args.path)
    search = Search(
        ids=args.ids.split(",") if args.ids else None,
        collections=args.collections.split(",") if args.collections else None,
        bbox=[float(x) for x in args.bbox.split(",")] if args.bbox else None,
        intersects=(json.loads(args.intersects) if args.intersects else None),
        datetime=args.datetime,
        filter=args.filter,
        fields=args.fields,
        sortby=args.sortby,
        limit=args.limit,
        offset=args.offset,
    )
    plan = build_plan(df, search)
    _write(plan, args.output)
    return 0


def cmd_translate(args) -> int:
    from .stac.translate import migrate_1_0_to_1_1
    spark = _spark(args)
    df = _read_items(spark, args.input)
    if args.migrate:
        df = migrate_1_0_to_1_1(df)
    _write(df, args.output)
    return 0


def cmd_validate(args) -> int:
    from .stac.items_io import iter_items
    spark = _spark(args)
    if args.full:
        # complete official spec schemas (vendored, offline $refs) —
        # the reference CLI's behavior (crates/validate)
        from .stac.schema_validate import validate_document as vfn
    else:
        from .stac.validate import validate_value as vfn
    df = _read_items(spark, args.path)
    n_bad = 0
    for item in iter_items(df if args.limit is None else df.limit(args.limit)):
        errors = vfn(item)
        if errors:
            n_bad += 1
            print(json.dumps({"id": item.get("id"), "errors": errors}))
    print(f"# {n_bad} invalid item(s)", file=sys.stderr)
    return 1 if n_bad else 0


def cmd_collections(args) -> int:
    from .stac.api import collections
    spark = _spark(args)
    df = _read_items(spark, args.path)
    json.dump(collections(df), sys.stdout, indent=2, default=str)
    sys.stdout.write("\n")
    return 0


def cmd_serve(args) -> int:
    """`rustac serve ITEMS.parquet` parity (crates/cli/src/lib.rs
    serve subcommand → crates/server): block serving the STAC API
    over the item table; --writable backs it with a TransactionClient
    on a snapshot table so POST /collections + POST items work."""
    from .stac.server import serve
    spark = _spark(args)

    # foreground serve() blocks in the accept loop, so startup
    # feedback must come from the pre-loop ready callback — printing
    # on return would only appear after shutdown
    def ready(base: str) -> None:
        print(f"serving STAC API at {base}", file=sys.stderr)

    if args.writable:
        from .stac.transactions import TransactionClient
        txn = TransactionClient(spark, args.table_dir)
        if txn.table.current_snapshot_id() is None:
            txn.add_items(_read_items(spark, args.path))
        serve(txn=txn, host=args.host, port=args.port,
              background=args.background, ready=ready)
    else:
        serve(items=_read_items(spark, args.path),
              host=args.host, port=args.port,
              background=args.background, ready=ready)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="rustac-spark")
    p.add_argument("--master", default=None,
                   help="spark master (default local[$SPARK_GRAFT_CPUS])")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("search", help="search a stac-geoparquet table")
    s.add_argument("path")
    s.add_argument("--ids")
    s.add_argument("--collections")
    s.add_argument("--bbox")
    s.add_argument("--intersects", help="GeoJSON geometry")
    s.add_argument("--datetime")
    s.add_argument("--filter", help="cql2-text")
    s.add_argument("--fields")
    s.add_argument("--sortby")
    s.add_argument("--limit", type=int)
    s.add_argument("--offset", type=int)
    s.add_argument("-o", "--output")
    s.set_defaults(fn=cmd_search)

    t = sub.add_parser("translate", help="convert between formats")
    t.add_argument("input")
    t.add_argument("output")
    t.add_argument("--migrate", action="store_true",
                   help="migrate v1.0.0 items to v1.1.0")
    t.set_defaults(fn=cmd_translate)

    v = sub.add_parser("validate", help="validate items")
    v.add_argument("path")
    v.add_argument("--limit", type=int)
    v.add_argument("--full", action="store_true",
                   help="validate against the complete official spec "
                        "schemas instead of the fast subset")
    v.set_defaults(fn=cmd_validate)

    c = sub.add_parser("collections", help="derive collection extents")
    c.add_argument("path")
    c.set_defaults(fn=cmd_collections)

    sv = sub.add_parser("serve", help="serve the STAC API over a table")
    sv.add_argument("path")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=7822)
    sv.add_argument("--writable", action="store_true",
                    help="enable transaction routes (snapshot-table "
                         "backed)")
    sv.add_argument("--table-dir", default="/tmp/rustac_spark_table",
                    help="snapshot table dir for --writable")
    sv.add_argument("--background", action="store_true",
                    help=argparse.SUPPRESS)  # test hook
    sv.set_defaults(fn=cmd_serve)

    args = p.parse_args(argv)
    from .stac.cql2 import Cql2Error
    from .stac.datetime_parse import DatetimeParseError
    from .stac.search import QueryNotImplemented, SearchValidationError
    try:
        return args.fn(args)
    except (SearchValidationError, Cql2Error, DatetimeParseError,
            QueryNotImplemented, ValueError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    raise SystemExit(main())
