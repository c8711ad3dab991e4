"""`python -m datachain_spark` entry point (reference datachain/__main__)."""

from datachain_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
