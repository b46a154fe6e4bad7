"""Full ELT run: fetch → enrich → land all five tables.

The Spark twin of the reference CLI run (``/root/reference/
dlt_fetch_timecamp.py:656-713``): one call fetches every dataset through a
`TimeCampClient`, applies the relational enrichment, and lands
dir-per-table files. Offline by default — pass
``fixtures.demo_transport()`` (tests do) or ``client.requests_transport
(token)`` for the real API.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from . import ingest, io
from .client import TimeCampClient, Transport

DATASETS = ("tasks", "users", "entries", "computer_activities", "application_names")


@dataclass
class PipelineResult:
    tables: dict[str, DataFrame] = field(default_factory=dict)
    paths: dict[str, str] = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    transport: Transport,
    out_dir: str,
    from_date: str,
    to_date: str,
    dates: list[str] | None = None,
    datasets: tuple[str, ...] = DATASETS,
    fmt: str = "parquet",
) -> PipelineResult:
    unknown = set(datasets) - set(DATASETS)
    if unknown:
        raise ValueError(f"unknown datasets: {sorted(unknown)}")

    client = TimeCampClient(transport)
    res = PipelineResult()

    def land(name: str, df: DataFrame) -> None:
        df = io.dedup_by_pk(df, io.schemas.PRIMARY_KEYS.get(name))
        res.tables[name] = df
        res.paths[name] = io.write_table(df, out_dir, name, fmt=fmt)

    acts: DataFrame | None = None
    if "tasks" in datasets:
        land("tasks", ingest.build_tasks(spark, client))
    if "users" in datasets:
        land("users", ingest.build_users(spark, client))
    if "entries" in datasets:
        land("entries", ingest.build_entries(spark, client, from_date, to_date))
    if "computer_activities" in datasets or "application_names" in datasets:
        # shared-scan elimination: one activities fetch feeds both outputs
        # (the reference preloads for the same reason, :447-454)
        acts = ingest.build_computer_activities(spark, client, dates or [])
        acts = acts.persist()
    if "computer_activities" in datasets and acts is not None:
        land("computer_activities", acts)
    if "application_names" in datasets and acts is not None:
        land("application_names", ingest.build_application_names(spark, client, acts))
    return res
