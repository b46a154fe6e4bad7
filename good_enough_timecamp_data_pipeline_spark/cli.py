"""CLI entry point — same surface as the reference's batch pipeline.

Mirrors ``python dlt_fetch_timecamp.py --from ... --to ... --output ...
--format ... --datasets ...`` (``/root/reference/dlt_fetch_timecamp.py:49-99``)
on the Spark engine::

    python -m good_enough_timecamp_data_pipeline_spark.cli \
        --from 2026-01-01 --to yesterday --output ./out --format parquet \
        --datasets tasks,users,entries

Credentials come from ``TIMECAMP_API_KEY`` (the reference reads the same
env via dotenv); ``--offline-demo`` swaps in the deterministic fixture
workspace so the full pipeline runs with zero network — that is also the
smoke-test path.
"""

from __future__ import annotations

import argparse
import datetime
import sys

from .session import get_spark
from .sources.client import requests_transport
from .sources.fixtures import demo_transport
from .sources.pipeline import DATASETS, run_pipeline

SUPPORTED_FORMATS = ("csv", "jsonl", "parquet")


def _resolve_date(s: str) -> str:
    if s.strip().lower() == "yesterday":
        return str(datetime.date.today() - datetime.timedelta(days=1))
    return s


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description="Fetch TimeCamp data with Spark and land it as files",
        epilog="By default, fetches data for yesterday unless specified otherwise.",
    )
    p.add_argument("--from", dest="from_date", default="yesterday",
                   help="Start date (YYYY-MM-DD or 'yesterday'). Default: yesterday")
    p.add_argument("--to", dest="to_date", default="yesterday",
                   help="End date (YYYY-MM-DD or 'yesterday'). Default: yesterday")
    p.add_argument("--output", default="./timecamp_data",
                   help="Output directory. Default: ./timecamp_data")
    p.add_argument("--format", dest="output_format", choices=SUPPORTED_FORMATS,
                   default="parquet", help="Output format. Default: parquet")
    p.add_argument("--datasets", default="entries",
                   help=f"Comma-separated datasets. Available: {', '.join(DATASETS)}. "
                        "Default: entries")
    p.add_argument("--warehouse", default=None,
                   help="ALSO load each landed dataset into a warehouse: "
                        "'duckdb:/path.db', 'sqlite:/path.db', or any "
                        "'jdbc:...' URL (jdbc:derby:/path;create=true runs "
                        "embedded with Spark's bundled driver) — the "
                        "reference pipeline's dlt destinations")
    p.add_argument("--jdbc-driver", default=None,
                   help="JDBC driver class for --warehouse jdbc: URLs "
                        "(e.g. org.apache.derby.jdbc.EmbeddedDriver)")
    p.add_argument("--resume", action="store_true",
                   help="Skip steps already completed for this window/format "
                        "(consults _run_ledger.json in the output dir)")
    p.add_argument("--offline-demo", action="store_true",
                   help="Use the built-in fixture workspace instead of the API")
    p.add_argument("--api-key", default=None,
                   help="TimeCamp API token (default: $TIMECAMP_API_KEY)")
    p.add_argument("--debug", action="store_true",
                   help="DEBUG-level console logging (file log is always INFO+)")
    return p.parse_args(argv)


def parse_datasets(datasets_str: str) -> tuple[str, ...]:
    datasets = tuple(d.strip().lower() for d in datasets_str.split(",") if d.strip())
    invalid = [d for d in datasets if d not in DATASETS]
    if invalid:
        raise ValueError(
            f"Invalid datasets: {', '.join(invalid)}. Available: {', '.join(DATASETS)}"
        )
    return datasets


def main(argv: list[str] | None = None) -> int:
    import os

    from .sources.logconf import load_dotenv, setup_logger

    args = parse_args(argv)
    datasets = parse_datasets(args.datasets)
    from_date, to_date = _resolve_date(args.from_date), _resolve_date(args.to_date)

    # .env first (reference: common/utils.py:19-26 loads dotenv before
    # reading TIMECAMP_* config), then a rotating-file run log UNDER the
    # output dir so artifacts and their log travel together
    load_dotenv()
    log = setup_logger(debug=args.debug, log_dir=os.path.join(args.output, "logs"))
    log.info(
        "run start: window=%s..%s datasets=%s format=%s output=%s",
        from_date, to_date, ",".join(datasets), args.output_format, args.output,
    )

    if args.offline_demo:
        transport = demo_transport()
    else:
        token = args.api_key or os.environ.get("TIMECAMP_API_KEY")
        if not token:
            log.error("no API key (use --api-key, $TIMECAMP_API_KEY / .env, "
                      "or --offline-demo)")
            print("error: no API key (use --api-key, $TIMECAMP_API_KEY, or "
                  "--offline-demo)", file=sys.stderr)
            return 2
        transport = requests_transport(token)

    # activity-dependent datasets need the explicit date grid (S4 semantics)
    dates = None
    if {"computer_activities", "application_names"} & set(datasets):
        d0 = datetime.date.fromisoformat(from_date)
        d1 = datetime.date.fromisoformat(to_date)
        dates = [str(d0 + datetime.timedelta(days=i)) for i in range((d1 - d0).days + 1)]

    spark = get_spark("timecamp_pipeline")
    res = run_pipeline(
        spark,
        transport,
        args.output,
        from_date,
        to_date,
        dates=dates,
        datasets=datasets,
        fmt=args.output_format,
        resume=args.resume,
    )
    for name, path in res.paths.items():
        tag = " (resumed)" if name in res.skipped else ""
        n_rows = res.row_counts.get(name)
        if n_rows is None:  # defensive: observation missing -> recompute
            n_rows = res.tables[name].count()
        line = f"{name}: {n_rows} rows -> {path}{tag}"
        log.info("%s", line)
        print(line)
    if args.warehouse:
        _load_warehouse(res.tables, args.warehouse, args.jdbc_driver, log)
    log.info("run complete: %d datasets", len(res.paths))
    return 0


def _load_warehouse(tables, warehouse: str, jdbc_driver: str | None, log) -> None:
    """Route each landed dataset into the requested warehouse — the
    reference's dlt destination step (README.md:3 claims BigQuery/
    MySQL/Postgres/SQLite/DuckDB; here duckdb:/sqlite: load via the
    parquet-staged writers and jdbc: through Spark's JDBC sink)."""
    from .sources import io

    for name, df in tables.items():
        if warehouse.startswith("duckdb:"):
            io.write_duckdb(df, warehouse[len("duckdb:"):], name)
        elif warehouse.startswith("sqlite:"):
            io.write_sqlite(df, warehouse[len("sqlite:"):], name)
        elif warehouse.startswith("jdbc:"):
            props = {"driver": jdbc_driver} if jdbc_driver else None
            io.write_jdbc(df, warehouse, name, properties=props)
        else:
            raise ValueError(
                f"unsupported --warehouse {warehouse!r} "
                "(expected duckdb:, sqlite:, or jdbc:)"
            )
        log.info("warehouse load: %s -> %s", name, warehouse)


if __name__ == "__main__":
    sys.exit(main())
