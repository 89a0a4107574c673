from dexscraper_spark.cli import run

raise SystemExit(run())
