"""CLI entry point: ``python -m nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark``.

Subcommands mirror the reference's operational entry points
(SURVEY.md section 3): the full pipeline run (Airflow DAG trigger),
and standalone validation of an existing table (GX entry point 3).

Examples::

    python -m nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark \\
        run-pipeline --warehouse /data/wh \\
        --source-template '/data/drops/yellow_tripdata_{month}.parquet'

    python -m nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark \\
        validate --warehouse /data/wh --layer silver \\
        --table silver_yellow_tripdata
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="nyc-taxi-spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    run_p = sub.add_parser("run-pipeline", help="run the full medallion pipeline")
    run_p.add_argument("--warehouse", required=True, help="warehouse root dir")
    run_p.add_argument("--source-template", required=True,
                       help="source path template with a {month} placeholder")
    run_p.add_argument("--month", default=None,
                       help="YYYY-MM to load (default: ledger watermark + 1)")
    run_p.add_argument("--slack-webhook", default=None,
                       help="webhook URL for failure alerts")

    val_p = sub.add_parser("validate", help="validate an existing table")
    val_p.add_argument("--warehouse", required=True)
    val_p.add_argument("--layer", required=True,
                       choices=["bronze", "silver", "gold"])
    val_p.add_argument("--table", required=True)

    args = parser.parse_args(argv)

    from .catalog import Warehouse
    from .session import get_spark

    spark = get_spark("nyc-taxi-cli")
    warehouse = Warehouse(args.warehouse)

    if args.cmd == "run-pipeline":
        from .pipeline.jobs import MedallionPipeline
        from .pipeline.runner import slack_alert

        alert = None
        if args.slack_webhook:
            def alert(pipeline, stage, error):  # noqa: E306
                slack_alert(args.slack_webhook, pipeline, stage, error)

        pipe = MedallionPipeline(
            spark, warehouse,
            source_path_for_month=lambda m: args.source_template.format(month=m),
            alert_hook=alert,
        )
        month = pipe.run_month(args.month)
        print(f"SUCCESS month={month}")
        return 0

    if args.cmd == "validate":
        from .quality.expectations import ValidationError, run_suite
        from .quality.suites import BRONZE_SUITE, GOLD_SUITE, SILVER_SUITE

        suites = {"bronze": BRONZE_SUITE, "silver": SILVER_SUITE,
                  "gold": GOLD_SUITE}
        df = warehouse.read(spark, args.layer, args.table)
        try:
            results = run_suite(df, suites[args.layer], args.table)
        except ValidationError as exc:
            print(f"FAILED: {exc}")
            return 1
        for r in results:
            print(r.describe())
        return 0

    return 2  # pragma: no cover


if __name__ == "__main__":
    sys.exit(main())
