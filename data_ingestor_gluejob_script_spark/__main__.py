"""CLI entry point — the reference's job-parameter surface
(``getResolvedOptions(sys.argv, ['JOB_NAME', 'Environment',
'JobTriggerOrigin', 'JobMode'])``, gluejob.py:603) as a standard
argparse program::

    python -m data_ingestor_gluejob_script_spark \\
        --trigger-origin OnDemand --job-mode allTables \\
        --source-root ./load --lake-root ./lake \\
        --watermark-path ./watermarks.json

``--trigger-origin Scheduled`` runs the incremental flow against
``--source-root`` via the file-backed source (point it at CSV drops);
a JDBC deployment constructs ``sources.jdbc.JdbcSource`` and passes it
to ``pipeline.incremental`` programmatically — credentials stay out of
argv. Unmapped parameter combinations are an explicit no-op, matching
README.md:17 of the reference.
"""

from __future__ import annotations

import argparse
import json
import sys

from .config import ConfigError, EnvConfigProvider, JsonFileConfigProvider
from .pipeline import LocalFileSource, run
from .registry import CATALOG
from .session import get_spark
from .watermarks import WatermarkStore


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="data_ingestor_gluejob_script_spark")
    p.add_argument("--trigger-origin", default="OnDemand",
                   help="OnDemand (initial load) | Scheduled (incremental); "
                        "anything else = no-op")
    p.add_argument("--job-mode", default="allTables",
                   help="allTables | one table name; anything else = no-op")
    p.add_argument("--environment", default=None,
                   help="deployment stage (the reference's Environment "
                        "job parameter, gluejob.py:603); selects the "
                        "config namespace. Path flags override config "
                        "values; without it all path flags are required")
    p.add_argument("--config-root", default=None,
                   help="directory of {environment}/parameters.json + "
                        "credentials.json; omit to read config from "
                        "INGESTOR_{ENV}_PARAMETERS / _CREDENTIALS env vars")
    p.add_argument("--source-root",
                   help="initial load: root of {database}/{table}.csv; "
                        "incremental: directory of {table}.csv drops")
    p.add_argument("--lake-root")
    p.add_argument("--watermark-path")
    p.add_argument("--company", default=None)
    p.add_argument("--app-name", default="data-ingestor-spark")
    args = p.parse_args(argv)

    if args.config_root and not args.environment:
        # Without an environment the provider branch is never entered —
        # fail loudly rather than silently ignoring the user's config
        # and then demanding path flags they expected to come from it.
        p.error("--config-root requires --environment (it selects the "
                "config namespace under that root)")

    # Resolve paths: explicit flag > environment config > error.
    params: dict = {}
    if args.environment:
        provider = (
            JsonFileConfigProvider(args.config_root, args.environment)
            if args.config_root
            else EnvConfigProvider(args.environment)
        )
        try:
            params = provider.parameters()
        except ConfigError as e:
            print(f"config error: {e}", file=sys.stderr)
            return 2
    for name in ("source_root", "lake_root", "watermark_path"):
        if getattr(args, name) is None:
            if name not in params:
                p.error(
                    f"--{name.replace('_', '-')} is required "
                    "(flag or environment config)"
                )
            setattr(args, name, params[name])
    if args.company is None:
        args.company = params.get("company", "Locaweb")

    spark = get_spark(args.app_name)
    store = WatermarkStore(args.watermark_path, list(CATALOG))
    result = run(
        spark,
        trigger_origin=args.trigger_origin,
        job_mode=args.job_mode,
        lake_root=args.lake_root,
        store=store,
        source_root=args.source_root,
        source=LocalFileSource(args.source_root),
        company=args.company,
    )
    print(json.dumps({
        "flow": result.flow,
        "tables": result.tables,
        "skipped": result.skipped,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
