"""``python -m elastic_freight_spark`` → CLI dispatch (see cli.py)."""

from elastic_freight_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
