"""CLI entry point mirroring the reference's argparse surface
(/root/reference/dbt_metrics_to_datahub.py:364-417): same seven flags,
same defaults, same dry-run semantics -- so a user of the reference can
run `python -m dbt_metrics_ingestion_script_spark --manifest ...` with
an unchanged command line.

Extensions beyond the reference: `--emission-log DIR` sinks the emission
frame to partitioned parquet instead of REST (the durable, replayable
sink for cluster runs), `--batch-size` controls REST batching (the
reference POSTs one entity at a time and its guide recommends batching
past ~500 entities, /root/reference/TESTING_GUIDE.md:324-327), and
`--master` pins the Spark master for local testing.
"""

from __future__ import annotations

import argparse
import logging
import sys

logger = logging.getLogger("dbt_metrics_ingestion_script_spark")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="dbt_metrics_ingestion_script_spark",
        description="Ingest dbt metrics into DataHub as GlossaryTerms (PySpark engine)",
    )
    parser.add_argument("--manifest", required=True, help="Path to dbt manifest.json file")
    parser.add_argument(
        "--datahub-url",
        default="http://localhost:8080",
        help="DataHub GMS URL (default: http://localhost:8080)",
    )
    parser.add_argument("--token", help="DataHub authentication token (optional)")
    parser.add_argument(
        "--platform", default="dbt", help="Platform name for lineage (default: dbt)"
    )
    parser.add_argument(
        "--env", default="PROD", help="Environment for lineage (default: PROD)"
    )
    parser.add_argument(
        "--glossary-root",
        default="dbt_metrics",
        help="Root glossary node name (default: dbt_metrics)",
    )
    parser.add_argument(
        "--dry-run",
        action="store_true",
        help="Parse and validate without emitting to DataHub",
    )
    parser.add_argument(
        "--emission-log",
        metavar="DIR",
        help="Write emissions to a partitioned parquet log at DIR instead of REST",
    )
    parser.add_argument(
        "--batch-size",
        type=int,
        default=50,
        help="Entities per REST request (default: 50)",
    )
    parser.add_argument("--master", help="Spark master override (e.g. local[4])")
    return parser


def make_sink(args: argparse.Namespace):
    from .sinks.base import NoopSink

    if args.dry_run:
        return NoopSink()
    if args.emission_log:
        from .sinks.emission_log import EmissionLogSink

        return EmissionLogSink(args.emission_log)
    from .sinks.rest import RestSink

    return RestSink(args.datahub_url, token=args.token, batch_size=args.batch_size)


def main(argv: list[str] | None = None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")
    args = build_parser().parse_args(argv)

    from .pipeline import ingest_metrics
    from .session import get_spark

    spark = get_spark(app_name="dbt-metrics-ingestion", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    logger.info("Loading manifest from %s", args.manifest)
    result = ingest_metrics(
        spark,
        args.manifest,
        sink=make_sink(args),
        glossary_root=args.glossary_root,
        platform=args.platform,
        env=args.env,
    )
    stats = result.stats
    if stats.get("aborted"):
        logger.warning("No metrics found in manifest -- nothing to ingest")
        return 1
    logger.info("Found %d metrics", stats["n_metrics"])
    if stats["n_quarantined"]:
        logger.warning("Quarantined %d malformed metric rows", stats["n_quarantined"])
    if stats["n_unresolved_lineage"]:
        logger.warning(
            "Could not resolve %d upstream lineage nodes", stats["n_unresolved_lineage"]
        )
    logger.info(
        "Ingested %d glossary nodes + %d terms (sink: %s)",
        stats["n_nodes"],
        stats["n_metrics"],
        stats["sink"],
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
