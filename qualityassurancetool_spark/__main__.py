"""``python -m qualityassurancetool_spark`` → the CLI in :mod:`.cli`."""

from qualityassurancetool_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
